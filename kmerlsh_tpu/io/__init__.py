from kmerlsh_tpu.io import clusterio, counts, fastq, kmc, samples  # noqa: F401

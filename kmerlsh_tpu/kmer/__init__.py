from kmerlsh_tpu.kmer import codec  # noqa: F401

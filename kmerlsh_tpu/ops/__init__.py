from kmerlsh_tpu.ops import lsh, segment, transform, ttest  # noqa: F401

from kmerlsh_tpu.utils import timing  # noqa: F401

from kmerlsh_tpu.parallel import dist, mesh  # noqa: F401

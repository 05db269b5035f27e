from kmerlsh_tpu.cluster import engine, greedy  # noqa: F401

from nextgenmap_tpu.parallel.mesh import make_mesh  # noqa: F401

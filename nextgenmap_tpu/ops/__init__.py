from nextgenmap_tpu.ops.scoring import score_matrix  # noqa: F401

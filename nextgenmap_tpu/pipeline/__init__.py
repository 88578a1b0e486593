from nextgenmap_tpu.pipeline.runner import run_mapping  # noqa: F401

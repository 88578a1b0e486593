from nextgenmap_tpu.models.mapper import Mapper, MapResult  # noqa: F401

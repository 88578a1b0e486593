from nextgenmap_tpu.utils.logging import get_logger  # noqa: F401
from nextgenmap_tpu.utils.stats import MappingStats  # noqa: F401

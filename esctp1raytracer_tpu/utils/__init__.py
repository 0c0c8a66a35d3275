from esctp1raytracer_tpu.utils.debug import QUIET, INFO, DEBUG, TRACE, get_logger, set_level
from esctp1raytracer_tpu.utils.timing import Timer

__all__ = ["QUIET", "INFO", "DEBUG", "TRACE", "get_logger", "set_level", "Timer"]

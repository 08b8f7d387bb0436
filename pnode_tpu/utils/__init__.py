from .meters import RunningAverageMeter
from .logging import Tee, get_logger, makedirs
from .recorder import Recorder
from .metrics import MetricsWriter

__all__ = [
    "RunningAverageMeter",
    "Tee",
    "get_logger",
    "makedirs",
    "Recorder",
    "MetricsWriter",
]

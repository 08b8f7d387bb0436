from .meters import RunningAverageMeter
from .logging import Tee, get_logger, makedirs
from .recorder import Recorder
from .metrics import MetricsWriter
from .debug import SolverDivergedError, assert_converged, dump_state, nan_guard
from .profiling import annotate, device_memory_gb, trace
from .checkpoint import load_checkpoint, save_checkpoint
from .optim import adam as flat_adam

__all__ = [
    "RunningAverageMeter",
    "Tee",
    "get_logger",
    "makedirs",
    "Recorder",
    "MetricsWriter",
    "SolverDivergedError",
    "assert_converged",
    "dump_state",
    "nan_guard",
    "annotate",
    "device_memory_gb",
    "trace",
    "save_checkpoint",
    "load_checkpoint",
    "flat_adam",
]

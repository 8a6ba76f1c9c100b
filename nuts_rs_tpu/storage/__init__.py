from .arrow import ArrowConfig
from .core import StorageConfig, TraceStorage
from .csv import CsvConfig
from .memory import MemoryConfig, MemoryStorage, Trace
from .zarr import ZarrConfig

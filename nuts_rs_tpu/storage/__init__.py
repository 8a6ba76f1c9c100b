from .core import StorageConfig, TraceStorage
from .memory import MemoryConfig, MemoryStorage, Trace

from .job import CdcBatchProcessor, run_file_stream, TaskStatus  # noqa: F401
from .store import ParquetTargetStore  # noqa: F401

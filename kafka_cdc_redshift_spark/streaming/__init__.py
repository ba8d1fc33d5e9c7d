from .job import CdcBatchProcessor, run_file_stream, TaskStatus  # noqa: F401
from .store import BucketedTargetStore, ParquetTargetStore  # noqa: F401
from .windows import hourly_rollup, sessionize, seen_keys_dedup  # noqa: F401

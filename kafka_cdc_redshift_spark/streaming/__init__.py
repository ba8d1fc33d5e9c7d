from .job import CdcBatchProcessor, run_file_stream, TaskStatus  # noqa: F401
from .listener import OffsetCommitListener  # noqa: F401
from .store import BucketedTargetStore, ParquetTargetStore  # noqa: F401
from .windows import (  # noqa: F401
    hourly_rollup,
    seen_keys_dedup,
    seen_keys_dedup_tws,
    sessionize,
    watermarked_dedup,
)

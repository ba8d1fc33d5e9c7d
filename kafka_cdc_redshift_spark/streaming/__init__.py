from .job import CdcBatchProcessor, run_file_stream, TaskStatus  # noqa: F401
from .listener import OffsetCommitListener  # noqa: F401
from .store import (  # noqa: F401
    AppendLog,
    BucketedTargetStore,
    MergeOnReadTargetStore,
    ParquetTargetStore,
)
from .windows import (  # noqa: F401
    hourly_rollup,
    seen_keys_dedup,
    seen_keys_dedup_tws,
    sessionize,
    watermarked_dedup,
)

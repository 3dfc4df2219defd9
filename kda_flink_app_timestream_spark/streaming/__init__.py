from .late import split_on_watermark
from .sink import BatchingForeachWriter, RejectedRecords
from .windows import session_windowed, sliding_windowed, tumbling_windowed

__all__ = [
    "BatchingForeachWriter",
    "RejectedRecords",
    "session_windowed",
    "sliding_windowed",
    "split_on_watermark",
    "tumbling_windowed",
]

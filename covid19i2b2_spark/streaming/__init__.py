from covid19i2b2_spark.streaming.cohort import (  # noqa: F401
    cohort_from_pairs,
    cohort_pair_stream,
    run_streaming_cohort,
)
from covid19i2b2_spark.streaming.daily_counts import (  # noqa: F401
    daily_event_counts,
    dedup_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stream_events,
)
from covid19i2b2_spark.streaming.entities import (  # noqa: F401
    run_streaming_entity_resolution,
)
from covid19i2b2_spark.streaming.drift import (  # noqa: F401
    run_streaming_drift_monitor,
)
from covid19i2b2_spark.streaming.embeddings import (  # noqa: F401
    run_streaming_embedding_ingest,
)

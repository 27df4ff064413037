from activedata_etl_spark.streaming.replay import (  # noqa: F401
    replay_journal,
    stream_journal,
)

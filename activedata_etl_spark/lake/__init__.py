from activedata_etl_spark.lake.schema_evolution import (  # noqa: F401
    align_to_schema,
    merge_schemas,
)
from activedata_etl_spark.lake.table import (  # noqa: F401
    CommitConflictError,
    SnapshotTable,
)

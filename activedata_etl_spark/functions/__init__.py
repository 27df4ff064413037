from activedata_etl_spark.functions.normalize import (  # noqa: F401
    LANG_BY_EXT,
    content_sha256,
    lang_from_path,
    normalize_batch,
    nullify_empty_strings,
    typed_encode_udf,
)

from travelpulse_spark_stream_tourism_analytics_spark.functions.geo import haversine_km
from travelpulse_spark_stream_tourism_analytics_spark.functions.numeric import (
    locale_numeric,
    minmax_norm,
    money_avg,
    money_sum,
    safe_ratio,
)
from travelpulse_spark_stream_tourism_analytics_spark.functions.temporal import (
    season_of,
    tumbling,
)
from travelpulse_spark_stream_tourism_analytics_spark.functions.text import (
    fold_accents,
    hash_hex,
    hash_u60,
    slugify,
    word_ngrams,
    words_of,
)

__all__ = [
    "haversine_km",
    "locale_numeric",
    "minmax_norm",
    "money_avg",
    "money_sum",
    "safe_ratio",
    "season_of",
    "tumbling",
    "fold_accents",
    "hash_hex",
    "hash_u60",
    "slugify",
    "word_ngrams",
    "words_of",
]

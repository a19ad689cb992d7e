"""Per-family query registry package.

Modules import in original registration order so the QUERIES/ORACLES
insertion order (and therefore the driver window) is unchanged from
the single-file registry this package was split from (round 10).
"""

from covid_custom_sql_engine_spark.registry._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

from covid_custom_sql_engine_spark.registry import core as _core  # noqa: F401
from covid_custom_sql_engine_spark.registry import relational as _relational  # noqa: F401
from covid_custom_sql_engine_spark.registry import text_dedup as _text_dedup  # noqa: F401
from covid_custom_sql_engine_spark.registry import retrieval_windows as _retrieval_windows  # noqa: F401
from covid_custom_sql_engine_spark.registry import sql_surface as _sql_surface  # noqa: F401
from covid_custom_sql_engine_spark.registry import sql_wide as _sql_wide  # noqa: F401
from covid_custom_sql_engine_spark.registry import corpus_prep as _corpus_prep  # noqa: F401
from covid_custom_sql_engine_spark.registry import tpch as _tpch  # noqa: F401
from covid_custom_sql_engine_spark.registry import bm25_spans as _bm25_spans  # noqa: F401
from covid_custom_sql_engine_spark.registry import layout_quality as _layout_quality  # noqa: F401
from covid_custom_sql_engine_spark.registry import sketches as _sketches  # noqa: F401
from covid_custom_sql_engine_spark.registry import ann_pq as _ann_pq  # noqa: F401
from covid_custom_sql_engine_spark.registry import profile_stats as _profile_stats  # noqa: F401
from covid_custom_sql_engine_spark.registry import media_codecs as _media_codecs  # noqa: F401
from covid_custom_sql_engine_spark.registry import corpus_graph_mining as _corpus_graph_mining  # noqa: F401
from covid_custom_sql_engine_spark.registry import attribution_drift as _attribution_drift  # noqa: F401
from covid_custom_sql_engine_spark.registry import stats_experiments as _stats_experiments  # noqa: F401
from covid_custom_sql_engine_spark.registry import epi as _epi  # noqa: F401
from covid_custom_sql_engine_spark.registry import rank_inference as _rank_inference  # noqa: F401
from covid_custom_sql_engine_spark.registry import timeseries_stats as _timeseries_stats  # noqa: F401
from covid_custom_sql_engine_spark.registry import glm_survival as _glm_survival  # noqa: F401
from covid_custom_sql_engine_spark.registry import graph_spatial as _graph_spatial  # noqa: F401
from covid_custom_sql_engine_spark.registry import ml_mining as _ml_mining  # noqa: F401
from covid_custom_sql_engine_spark.registry import feature_quality as _feature_quality  # noqa: F401
from covid_custom_sql_engine_spark.registry.window import (  # noqa: F401
    _DRIVER_WINDOW_PRIORITY,
)

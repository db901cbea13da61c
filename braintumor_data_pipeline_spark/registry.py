"""Central query registry — the contract surface the driver checks.

Every operator from SURVEY §2 that we implement registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` builder, plus (when the operator
is SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value-hash, so:

- every computed column is aliased identically on both sides;
- every floating-point output is ``round(x, 6)`` on both sides (different
  summation orders perturb low bits; 6 decimals is far coarser than the
  ~1e-10 relative error of double accumulation at these row counts);
- every LIMIT carries a total-order ORDER BY (value, then key) so both
  engines cut the same prefix.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    #: Set when the oracle is a frozen VALUES golden generated at one
    #: specific scale factor (tools/pin_oracle.py) rather than a
    #: recomputation — valid only at that SF; verify_local downgrades it
    #: to rows-only elsewhere. None for true recomputing oracles.
    pinned_sf: str | None = None


_REGISTRY: dict[str, QuerySpec] = {}

#: The driver hash-checks only the FIRST 50 entries of ``queries()``
#: (registration order). This explicit window samples every operator
#: family of SURVEY §2.4-§2.11 plus the LLM-pipeline families and is
#: oracle-backed throughout (rows-only queries carry no hash signal and
#: are ordered last). Slots ROTATE round-over-round: a query green in two
#: consecutive driver rounds vacates its slot for a never-driver-checked
#: oracle-backed query, amortizing hash coverage across the catalog
#: (round 3 rotated out setop_intersect_nations, proj_path_functions,
#: proj_hash_null_scalars, agg_statistics — twice-green — plus
#: group_stats_pop (twice-green), argmax_per_group, json_extract_props,
#: pivot_event_type_counts and knn_within_label (once-green, formulation
#: unchanged) for the eight first-time entries below plus the new
#: bucketed_star_join). Late round 3 adds five NEW operator families
#: (count-min, bloom, HLL, image pHash, JSONL round-trip) by vacating
#: five once-green formulation-unchanged slots with in-window family
#: coverage remaining: null_semantics_groups (relational core keeps 7
#: entries), token_stats (bm25 + lang_id stay), dedup_exact_groups
#: (4 dedup entries stay), mask_confusion (imaging_udf_confusion checks
#: the same confusion algebra), events_tumbling_5m (session + as-of
#: stay). Two invariants constrain the
#: rotation: every bench HEADLINE query stays in-window so the perf and
#: correctness gates cover the same surface, and queries whose
#: formulation changed this round (decimal money sums) stay in-window so
#: the new formulation gets driver confirmation.
#:
#: Final round-3 rotation: ten twice-green, formulation-unchanged,
#: non-headline slots vacate for the session's nine new first-time
#: families plus the ORC interchange rep — out: pixel_windowing
#: (pixel_minmax stays), region_grow_capped (component + adaptive
#: stay), q12 + q3 (q6/q21 keep tpch_shapes), train_test_split_documents
#: + corpus_prep_end_to_end (filter_cascade keeps llm_pipeline),
#: scd2_user_type_history (merge_upsert keeps CDC),
#: imaging_udf_confusion (imaging_udf_stats keeps the Arrow-UDF
#: surface; the confusion algebra stays checked via mask_metrics),
#: rolling_7d_revenue (ohlc keeps timeseries), event-family spares —
#: in: csv_roundtrip_stats, orc_roundtrip_stats,
#: global_dense_ids_documents, interval_overlap_attribution,
#: bfs_levels_from_min_vertex, shingle_containment_pairs,
#: hll_mergeable_groups, incremental_dedup_new_batch,
#: filter_cascade_report (dedup_connected_components stays as the
#: components-module rep — the test_queries_smoke invariant that every
#: recomputing-oracle module keeps a window slot).
DRIVER_WINDOW = 50
PRIORITY: tuple[str, ...] = (
    # relational core (scan/filter/proj/agg/join/setop/window/topk)
    "flagship_avg_by_group",
    "pricing_summary",
    "star_join_revenue",
    "top_revenue_orders",
    "window_rank_orders",
    "rollup_lineitem",
    "histogram_totalprice",
    # first-time driver checks (round-3 rotation)
    "lateral_top2_orders_per_customer",
    "merge_upsert_orders",
    "date_spine_daily_revenue",
    "cohort_weekly_retention",
    "ohlc_hourly_downsample",
    "winnowing_fingerprints",
    "q6_forecast_revenue",
    "q21_sole_returning_supplier",
    # analytics (scalar function surfaces, Arrow UDAF)
    "geomean_grouped_agg_udf",
    # imaging UDF path (applyInPandas numpy, hash-checked vs grid SQL).
    # imaging_udf_stats (once-green r2, formulation unchanged) vacated
    # for the new experiments family; ssim_window_map keeps the
    # applyInPandas hash surface in-window.
    "ssim_window_map",
    # experiments family rep: 500-row per-doc entropy — the widest hash
    # signal of the new module (A/B stats emit 1-row outputs)
    "token_entropy_quality",
    # text analysis (bm25 keeps the family's slot; lang_id_heuristic —
    # once-green, formulation unchanged — vacated for the new
    # schema-evolution source family)
    "bm25_search_topk",
    "schema_evolution_scan",
    # dedup — simhash_hamming_pairs replaced simhash_signatures and
    # pagerank_fixed_point (graph family) replaced minhash_lsh_pairs:
    # each new entry computes its predecessor's relation as a strict
    # subplan (signatures under the hamming bands; LSH pairs under the
    # PageRank edge list), so the vacated query's hash signal survives
    # transitively while the window gains the graph family and the
    # banding+verify stages.
    "pagerank_fixed_point",
    "minhash_dedup_groups",
    "ngram_jaccard_pairs",
    "simhash_hamming_pairs",
    # similarity / kNN
    "knn_bruteforce_cosine",
    # sketches (count-min / bloom / HLL) — first driver checks.
    # hll_register_sketch vacated for the generator family rep: its
    # global register build is a strict sub-computation of
    # hll_mergeable_groups (per-group registers + merge ≡ union
    # identity), so the vacated hash signal survives transitively.
    "countmin_heavy_hitters",
    "bloom_semijoin_reduction",
    "hll_mergeable_groups",
    # zero-I/O in-plan generator (dbgen-style source; 3-group pricing
    # rollup over LCG-mixed integer columns — widest generator output)
    "synthetic_lineitem_pricing",
    # multimodal image near-dup (pHash; signatures is a strict subplan
    # of the pairs query, so its hash signal survives transitively)
    "phash_hamming_pairs",
    # JSONL round-trip (source/sink fidelity)
    "jsonl_roundtrip_stats",
    # pixel relation (imaging as SQL)
    "pixel_minmax_normalize",
    # mask algebra / metrics
    "mask_metrics",
    # iterative segmentation (uncapped component, the dequeue-cap quirk,
    # and the adaptive-threshold schedule — all hash-checked)
    "region_grow_component",
    "region_grow_adaptive",
    # skew handling + connected components
    "salted_heavy_key_agg",
    "dedup_connected_components",
    # bucketed co-located join (zero-shuffle layout)
    "bucketed_star_join",
    # ORC interchange (csv slot below; both are lossless-egress gates)
    "orc_roundtrip_stats",
    # multimodal audio (oracle recomputes features from raw bytes; a
    # hash match certifies the WAV round trip — takes the slot vacated
    # by latest_events, the lowest-information once-green relational
    # query, since bench HEADLINE queries may not leave the window and
    # no twice-green slot remained after this round's rotation)
    "multimodal_audio_features",
    # engine-native recursion (byte-identical SQL on both engines) —
    # takes the slot of event_transition_matrix (once-green, unchanged)
    "rcte_clamped_balance",
    # final round-3 rotation: eight new first-time families
    "csv_roundtrip_stats",
    "global_dense_ids_documents",
    "interval_overlap_attribution",
    "bfs_levels_from_min_vertex",
    "shingle_containment_pairs",
    "incremental_dedup_new_batch",
    "filter_cascade_report",
    # streaming (batch-equivalent forms)
    "events_session_30m",
    "events_asof_last_view",
)


def _ordered() -> dict[str, QuerySpec]:
    """Registry in driver-facing order: PRIORITY window first, then the
    remaining oracle-backed queries (registration order), then rows-only
    queries (no hash signal — never let them occupy a checked slot)."""
    missing = [n for n in PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    out: dict[str, QuerySpec] = {n: _REGISTRY[n] for n in PRIORITY}
    rest = [n for n in _REGISTRY if n not in out]
    for n in rest:
        if _REGISTRY[n].oracle:
            out[n] = _REGISTRY[n]
    for n in rest:
        if not _REGISTRY[n].oracle:
            out[n] = _REGISTRY[n]
    return out


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    pinned_sf: str | None = None,
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags,
            doc=(fn.__doc__ or "").strip(), pinned_sf=pinned_sf,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Name → spec for everything registered (imports the operator
    modules), ordered so the driver's checked prefix samples every
    operator family (see PRIORITY)."""
    _load_all()
    return _ordered()


def queries_dict() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracles_dict() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle
    }


_loaded = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    # Imported for their registration side effects.
    from .operators import (  # noqa: F401
        relational,
        analytics,
        bucketed,
        text,
        dedup,
        similarity,
        pixels,
        masks,
        segmentation,
        imaging_udf,
        multimodal,
        skew,
        bpe,
        components,
        graph,
        tpch_shapes,
        llm_pipeline,
        cdc,
        timeseries,
        phash,
        sketch,
        recursive,
        indexing,
        intervals,
        experiments,
    )
    from .plans import app_flow  # noqa: F401
    from .sources import csv_io as _csv_io  # noqa: F401
    from .sources import jsonl as _jsonl  # noqa: F401
    from .sources import orc_io as _orc_io  # noqa: F401
    from .sources import generator as _generator  # noqa: F401
    from .sources import textdir as _textdir  # noqa: F401
    from .sources import maintenance as _maintenance  # noqa: F401
    from .streaming import events as _events  # noqa: F401

    _loaded = True

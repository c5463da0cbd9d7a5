"""Fillup — gap filling (SURVEY.md §2.9, reference
StationBases.py:1346-1669, docs/source/Methode.md:92-130).

The reference loops neighbors in distance order with an UPDATE per neighbor
until no holes remain (PL/pgSQL, StationBases.py:1573-1638). That loop is
semantically "first non-null regionalized donor value in neighbor-rank
order per timestamp" (SURVEY.md §2.11), which Spark expresses declaratively:

    facts LEFT JOIN (knn x donor-facts) ON (station_id, ts)
    -> min_by(regionalized_value, rank) over the group

One equi-join shuffle keyed on (station_id, ts) and one groupBy on the same
key — with both sides partitioned identically Catalyst plans a single
exchange. No iteration, no driver loop; scales linearly in (facts x k).

T's variant ("median of the 5 nearest non-null donors per timestamp",
StationT.py:122-143) uses the same join with a rank-ordered array slice.

Linear interpolation of leftover short gaps (StationBases.py:1494-1562)
uses last/first ignorenulls windows bounded by the configured max gap.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from functools import lru_cache

from weatherdb_spark.functions.caching import scoped_persist
from weatherdb_spark.functions.partitioning import year_chunked
from weatherdb_spark.functions.temporal import is_winter, shifted_date


@lru_cache(maxsize=64)
def _topn_exprs(value_cols: tuple, n: int):
    """The top-n-by-rank aggregate and its derived median / donor-list
    / candidate-count Columns, memoized per (value_cols, n): Column
    objects are immutable plan-independent templates, and the deep-fill
    path builds this shape three times per query (near, far head, far
    tail) — ~0.2 s of py4j round trips each when rebuilt."""
    struct_fields = [F.col("rank")] + [
        F.col(f"_reg_{c}").alias(f"r_{c}") for c in value_cols
    ] + [F.col("nb_station_id").cast("short").alias("nb")]
    top = F.slice(
        F.array_sort(F.collect_list(F.struct(*struct_fields))), 1, n
    ).alias("_top")
    meds = {}
    for c in value_cols:
        vals = F.array_sort(F.filter(
            F.transform(F.col("_top"), lambda s: s[f"r_{c}"]),
            lambda v: v.isNotNull(),
        ))
        nsz = F.size(vals)
        odd = F.element_at(vals, ((nsz + 1) / 2).cast("int"))
        even = (
            F.element_at(vals, (nsz / 2).cast("int"))
            + F.element_at(vals, (nsz / 2 + 1).cast("int"))
        ) / 2
        meds[c] = (
            F.when(nsz == 0, F.lit(None).cast("double"))
            .when(nsz % 2 == 1, odd)
            .otherwise(even)
        )
    donors = F.transform(F.col("_top"), lambda s: s["nb"])
    ncand = F.size(F.col("_top"))
    return top, meds, donors, ncand


def _regionalize(coef_sign: str, val, ma_self, ma_nb, round_digits):
    if coef_sign == "add":
        reg = val + (ma_self - ma_nb)
    elif coef_sign == "mult":
        reg = val * ma_self / ma_nb
    else:
        raise ValueError(f"coef_sign {coef_sign!r}")
    # the reference rounds each regionalized donor value to storage
    # precision before use: round(nb.qc * coef)::int, StationBases.py:1403,1422
    return F.round(reg, round_digits) if round_digits is not None else reg


def _build_pairs(knn: DataFrame, ma: DataFrame, seasonal_ma: bool) -> DataFrame:
    """knn x MA dim: (station_id, nb_station_id, rank, dist_m, _ma_self,
    _ma_nb[, term]). Small (stations x neighbors) — always broadcast."""
    if seasonal_ma:
        ma_self = ma.select("station_id", "term", F.col("value").alias("_ma_self"))
        ma_nb = ma.select(
            F.col("station_id").alias("nb_station_id"),
            "term",
            F.col("value").alias("_ma_nb"),
        )
        return (
            knn
            .join(F.broadcast(ma_self), "station_id")
            .join(F.broadcast(ma_nb), ["nb_station_id", "term"])
        )
    ma_self = ma.select("station_id", F.col("value").alias("_ma_self"))
    ma_nb = ma.select(
        F.col("station_id").alias("nb_station_id"), F.col("value").alias("_ma_nb")
    )
    return (
        knn
        .join(F.broadcast(ma_self), "station_id")
        .join(F.broadcast(ma_nb), "nb_station_id")
    )


def _seasonal_filter(donors: DataFrame, ts_col: str, seasonal_ma: bool) -> DataFrame:
    if seasonal_ma:
        return donors.filter((F.col("term") == "wihy") == is_winter(F.col(ts_col)))
    return donors


#: above this measured hole fraction, hole-driven candidate generation
#: (_hole_candidates) is skipped and the donor expansion streams through
#: a map-side broadcast join instead: with most rows holed, holes x k
#: approaches the full expansion AND adds a donor-side shuffle
#: (measured: 1.9x SLOWER at 89% holes on the sf0.1 deep fixture;
#: 1.4x faster at 26% holes on the 10.5M-row stress — production
#: tables sit at 1-10% holes, where the win grows with the hole cut)
HOLE_SEMI_MAX_FRACTION = 0.35


def _resolve_hole_semi(facts: DataFrame, base_col: str,
                       hole_semi: bool | None) -> bool:
    """Decide whether the donor candidate stream should be built FROM
    the hole keys (see :func:`_hole_candidates`) instead of streaming
    every donor row through the selection. ``None`` auto-sizes
    with ONE cheap aggregate job (count + non-null count of the base
    column — a single-column scan, negligible next to the fill itself);
    an explicit bool skips the probe for callers that know their hole
    regime (e.g. incremental stages over freshly imported windows)."""
    if hole_semi is not None:
        return hole_semi
    frac = _hole_fraction(facts, base_col)
    return frac is not None and frac <= HOLE_SEMI_MAX_FRACTION


def _hole_fraction(facts: DataFrame, base_col: str) -> float | None:
    """Measured NULL fraction of ``base_col`` — ONE cheap single-column
    aggregate job; None on an empty table."""
    row = facts.agg(
        F.count(F.lit(1)).alias("_n"), F.count(base_col).alias("_nn")
    ).first()
    n = row["_n"]
    return None if n == 0 else 1 - row["_nn"] / n


def _hole_candidates(holes: DataFrame, pairs_dim: DataFrame,
                     donor_facts: DataFrame, ts_col: str) -> DataFrame:
    """Donor candidate stream built FROM the hole keys: holes x the
    broadcast pair dim, then the donor facts equi-joined on
    (nb_station_id, ts). Only NULL-base rows ever consume a fill, so at
    production hole rates (1-10%) this moves |donors| + |holes| x k rows
    through the shuffles instead of streaming the full |donors| x k
    candidate expansion through the selection exchange — the expansion
    never materializes for non-hole timestamps at all. (The previous
    shape semi-joined the full expansion to the hole keys, which still
    shuffled every expanded row once.)

    The donor join is deliberately UNHINTED: a shuffle-hash hint would
    build an in-memory hash of holes x k rows per partition, which
    cannot spill and OOMs the moment a caller forces this path on a
    high-hole-rate table (measured at 89% holes, sf0.1). Sort-merge is
    spill-safe, and AQE converts the join to broadcast/shuffled-hash at
    runtime from the target side's ACTUAL size in exactly the low-hole
    regime this path is chosen for."""
    targets = holes.join(F.broadcast(pairs_dim), "station_id")
    return targets.join(donor_facts, ["nb_station_id", ts_col])


def rank_fill(
    facts: DataFrame,
    knn: DataFrame,
    ma: DataFrame,
    coef_sign: str = "mult",
    base_col: str = "qc",
    ts_col: str = "timestamp",
    seasonal_ma: bool = False,
    round_digits: int | None = 2,
    cascade_k: int | None = None,
    donor_facts: DataFrame | None = None,
    hole_semi: bool | None = None,
) -> DataFrame:
    """P/ET/PD fillup: fill NULL ``base_col`` with the first non-null
    regionalized donor value in neighbor-rank order; record the donor in
    ``filled_by`` (StationBases.py:1444-1492).

    ``knn``: (station_id, nb_station_id, rank) — rank 1 = nearest. Pass
    the FULL candidate set within max_fillup_dist
    (``knn_stations(k=None, max_dist_m=...)``): the reference loop
    iterates every station in distance order until no holes remain
    (StationBases.py:1573-1638), so the 5 nearest are not enough.

    ``cascade_k``: scale path. facts x all-neighbors-in-130km is a huge
    intermediate at cluster scale; with ``cascade_k`` the donor join runs
    against the nearest ``cascade_k`` neighbors first, and only the
    timestamps that found NO donor there rejoin against the remaining
    candidates (holes shrink ~geometrically with donor count, so phase 2
    is tiny). Result is bitwise-identical to the unbounded join — the
    first non-null donor in rank order is in phase 1 whenever one exists
    there.

    ``ma``: (station_id, value) or, when ``seasonal_ma``, (station_id,
    term, value) with term in ('wihy', 'suhy') — P uses separate
    winter/summer regionalization factors (StationBases.py:1406-1425).
    ``donor_facts``: donor pool override for per-station scoped runs
    (``Broker.fillup(stids=...)``) — targets narrow to ``facts`` while
    donors still draw from the full table. Defaults to ``facts``.
    ``hole_semi``: build the donor candidate stream FROM the hole keys
    (``None`` auto-sizes via the measured hole fraction — see
    :func:`_resolve_hole_semi` and :func:`_hole_candidates`).
    Returns facts + ``filled``, ``filled_by``.
    """
    donor_src = donor_facts if donor_facts is not None else facts
    donor_facts = donor_src.filter(F.col(base_col).isNotNull()).select(
        F.col("station_id").alias("nb_station_id"),
        F.col(ts_col),
        F.col(base_col).alias("_nb_val"),
    )
    pairs = _build_pairs(knn, ma, seasonal_ma)

    reg = _regionalize(
        coef_sign, F.col("_nb_val"), F.col("_ma_self"), F.col("_ma_nb"), round_digits
    )

    # only NULL-base rows ever consume a fill, so (below the hole-rate
    # threshold) the donor candidate stream is BUILT from the hole keys
    # (_hole_candidates) — the |donors| x k expansion never exists for
    # non-hole timestamps; above the threshold the expansion is cheaper
    # than hole-keyed generation and the donor side streams through a
    # map-side broadcast join instead
    hole_semi = _resolve_hole_semi(facts, base_col, hole_semi)
    all_holes = facts.filter(F.col(base_col).isNull()).select(
        "station_id", ts_col
    )

    def _candidates(pairs_dim: DataFrame) -> DataFrame:
        # hole-driven below the threshold; donor-streamed above it
        # (broadcast hint on the joined dim itself, or Spark may pick
        # the facts as the build side and collect them to the driver)
        cand = (
            _hole_candidates(all_holes, pairs_dim, donor_facts, ts_col)
            if hole_semi
            else donor_facts.join(F.broadcast(pairs_dim), "nb_station_id")
        )
        return _seasonal_filter(cand, ts_col, seasonal_ma)

    def _best(donors: DataFrame) -> DataFrame:
        sel = donors.select(
            "station_id", ts_col, "rank", reg.alias("_reg"), "nb_station_id"
        )
        # first donor in rank order: min_by over (rank) per (station, ts)
        return (
            sel.groupBy("station_id", ts_col)
            .agg(
                F.min_by("_reg", "rank").alias("_fill_val"),
                F.min_by("nb_station_id", "rank").alias("_fill_by"),
            )
        )

    if cascade_k is None:
        best = _best(_candidates(pairs))
    else:
        # the pair dim feeds three joins (near, holes anti-join target,
        # far); persist so the knn x ma build runs once — it is dim-sized
        # (pairs of stations), never fact-sized
        pairs = scoped_persist(pairs)
        near = pairs.filter(F.col("rank") <= cascade_k)
        best1 = _best(_candidates(near))
        # holes that found no donor among the nearest k (shuffle-hash:
        # see median_fill's targets anti-join note)
        holes = all_holes.join(
            best1.select("station_id", ts_col).hint("shuffle_hash"),
            ["station_id", ts_col], "left_anti"
        )
        far = pairs.filter(F.col("rank") > cascade_k)
        # the far phase is ALWAYS hole-driven (holes here is the rare
        # no-near-donor remainder): holes x far-pairs first, THEN the
        # donor facts — the blowup never materializes for non-hole rows
        best2 = _best(
            _seasonal_filter(
                _hole_candidates(holes, far, donor_facts, ts_col),
                ts_col, seasonal_ma,
            )
        )
        best = best1.unionByName(best2)

    # shuffle-hash, not sort-merge: neither the fact table nor the
    # per-timestamp best-donor stream benefits from being sorted, and the
    # best side is at most one row per fact row — hash-building it skips
    # two full sorts of fact-sized data
    out = facts.join(best.hint("shuffle_hash"), ["station_id", ts_col], "left")
    return (
        out.withColumn(
            "filled", F.coalesce(F.col(base_col), F.col("_fill_val"))
        )
        .withColumn(
            "filled_by",
            F.when(F.col(base_col).isNull() & F.col("_fill_val").isNotNull(),
                   F.col("_fill_by").cast("short")),
        )
        .drop("_fill_val", "_fill_by")
    )


def median_fill(
    facts: DataFrame,
    knn: DataFrame,
    ma: DataFrame,
    n_donors: int = 5,
    base_col: str = "qc",
    value_cols: tuple[str, ...] = ("qc",),
    out_cols: tuple[str, ...] = ("filled",),
    ts_col: str = "timestamp",
    round_digits: int | None = 1,
    near_dist_m: float | None = None,
    cascade_k: int | None = None,
    donor_facts: DataFrame | None = None,
    hole_semi: bool | None = None,
    near_cascade_k: int | Literal["auto"] | None = None,
) -> DataFrame:
    """T fillup: fill with the exact median of the first ``n_donors``
    non-null regionalized donors in rank order; ``filled_by`` is the array
    of donor ids used, in neighbor-rank order — filled_by[0] is the
    nearest donor, as in the reference's slot array
    (StationBases.py:1436-1480, StationT.py:122-143).

    ``knn`` should be the FULL candidate set within max_fillup_distance
    (``knn_stations(k=None, max_dist_m=...)``) — the reference loops all
    stations in distance order until every hole has donors, so a timestamp
    where the 5 nearest are null draws from farther stations.

    ``near_dist_m`` mirrors the reference's ``_fillup_max_dist`` exit
    condition (StationT.py:48, StationBases.py:1467-1471): within it, up
    to ``n_donors`` donors are collected; beyond it the loop only keeps
    going for timestamps that still have NO donor, so a far donor is used
    alone and only when no near donor exists. (The reference's exit check
    is global across the station's timestamps; this is the per-timestamp
    reading of the same rule.)

    ``cascade_k``: same scale path as :func:`rank_fill` — donor join
    against the nearest ``cascade_k`` candidates first; only timestamps
    that did NOT find ``n_donors`` qualifying donors there are recomputed
    against the full set. Identical output to the unbounded join.

    ``value_cols``/``out_cols`` handle T's (qc, raw_min, raw_max) ->
    (filled, filled_min, filled_max) triple in one pass.

    ``donor_facts``: donor pool override for per-station scoped runs —
    see :func:`rank_fill`. Defaults to ``facts``.
    ``hole_semi``: build the candidate streams FROM the hole keys
    (``None`` auto-sizes via the measured hole fraction — see
    :func:`_resolve_hole_semi` and :func:`_hole_candidates`).

    ``near_cascade_k``: cascade the NEAR aggregation too — first the
    nearest ``near_cascade_k`` ranks, then only timestamps that found
    fewer than ``n_donors`` candidates there re-aggregate against the
    complete near set. Identical output (rank contiguity — see the
    inline note); pays off when the near radius holds many more donors
    than ``n_donors`` (T's 100 km in a dense network), wasteful when
    near donors are sparse or mostly null (most timestamps recompute).
    ``"auto"`` decides from a dim-sized near-count probe plus the
    measured hole fraction; default off. The cascade only exists inside
    the near branch, so an explicit int without ``near_dist_m`` raises
    (it would be silently ignored); ``"auto"`` without a near radius is
    a no-op by definition (nothing to gate).
    """
    if near_cascade_k is not None and near_cascade_k != "auto":
        # bool is an int subclass: True would silently configure a
        # degenerate rank<=1 cascade head instead of enabling "auto"
        if (
            isinstance(near_cascade_k, bool)
            or not isinstance(near_cascade_k, int)
            or near_cascade_k < 1
        ):
            raise ValueError(
                f"near_cascade_k must be a positive int, 'auto' or None; "
                f"got {near_cascade_k!r}"
            )
        if near_dist_m is None:
            raise ValueError(
                "near_cascade_k is an explicit int but near_dist_m is None: "
                "the near cascade only exists inside the near branch, so "
                "the knob would be silently ignored. Pass near_dist_m or "
                "drop near_cascade_k."
            )
    donor_src = donor_facts if donor_facts is not None else facts
    donor_facts = donor_src.filter(F.col(base_col).isNotNull()).select(
        F.col("station_id").alias("nb_station_id"),
        F.col(ts_col),
        *[F.col(c).alias(f"_nbv_{c}") for c in value_cols],
    )
    pairs = _build_pairs(knn, ma, seasonal_ma=False)

    # only NULL-base rows consume a fill — below the hole-rate threshold
    # the candidate streams are BUILT from the hole keys
    # (_hole_candidates; see the near-branch note below). The measured
    # fraction feeds BOTH auto-sizers with one probe job.
    frac = (
        _hole_fraction(facts, base_col)
        if hole_semi is None
        or (near_cascade_k == "auto" and near_dist_m is not None)
        else None
    )
    if hole_semi is None:
        hole_semi = frac is not None and frac <= HOLE_SEMI_MAX_FRACTION
    hole_keys = facts.filter(F.col(base_col).isNull()).select(
        "station_id", ts_col
    )

    def _cand(pairs_dim: DataFrame) -> DataFrame:
        # hole-driven below the threshold; donor-streamed above it
        if hole_semi:
            return _hole_candidates(hole_keys, pairs_dim, donor_facts, ts_col)
        return donor_facts.join(F.broadcast(pairs_dim), "nb_station_id")

    def _select(donors: DataFrame) -> DataFrame:
        # plain (no near-distance) selection: first n non-null donors per
        # timestamp, in rank order. The near_dist_m path never reaches
        # this — it has its own complete-near-set + far-cascade pipeline
        # below (the _fillup_max_dist exit condition of
        # StationBases.py:1467-1471 lives there).
        wrank = W.partitionBy("station_id", ts_col).orderBy("rank")
        return (
            donors.withColumn("_rn", F.row_number().over(wrank))
            .filter(F.col("_rn") <= n_donors)
            .withColumn("_near", F.lit(True))
        )

    def _plain_aggs():
        # built lazily: the near_dist_m path below has its own
        # _topn_best aggregation and never uses these — constructing
        # them anyway cost ~0.2 s of py4j per call on the deep-fill
        # bench path (guide §1: the driver's plan-build time is part
        # of the query wall at interactive scale)
        aggs = []
        for c in value_cols:
            reg = _regionalize(
                "add", F.col(f"_nbv_{c}"), F.col("_ma_self"),
                F.col("_ma_nb"), round_digits
            )
            aggs.append(F.percentile(reg, F.lit(0.5)).alias(f"_med_{c}"))
        # donor ids in neighbor-rank order (reference slot order:
        # [0] = nearest)
        aggs.append(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("rank"),
                                 F.col("nb_station_id").cast("short").alias("nb"))
                    )
                ),
                lambda s: s["nb"],
            ).alias("_donors")
        )
        # near-donor count decides whether a cascade phase-1 result is
        # final
        aggs.append(F.sum(F.col("_near").cast("int")).alias("_n_near"))
        return aggs

    if near_dist_m is not None:
        # The near candidates (dist <= near_dist_m) are a DISTANCE-bounded
        # per-station set — it does not grow with station count the way
        # rank-k sets do — so the first-n-near selection runs over the
        # COMPLETE near pair set in one pass: exact by construction, no
        # cascade phase needed. The far single-donor rule only applies to
        # hole timestamps with NO near donor at all; that search is
        # quota-1 in rank order and cascades like rank_fill (the nearest
        # cascade_k far candidates first, the rare still-empty tail
        # against the rest). The old shape — finalize only at full near
        # quota, rejoin the FULL O(n^2) pair set for everything else —
        # degenerated to targets x all-pairs when near donors are sparse.
        pairs = scoped_persist(pairs)
        near_pairs = pairs.filter(F.col("dist_m") <= near_dist_m)
        far_pairs = pairs.filter(F.col("dist_m") > near_dist_m)

        if near_cascade_k == "auto":
            # enable the near-side cascade only where phase 1 can
            # actually finish most timestamps: the near set must be
            # much denser than the cascade head (else phase 1 IS the
            # full set), and enough donors must be non-null that the
            # head usually meets the donor quota (at high hole rates
            # the quota-miss recompute doubles the work — measured
            # 4.0s -> 5.7s at 80% holes, dense). Probes: one dim-sized
            # count over the near PAIR dim + the hole fraction already
            # measured above.
            # a 4x head gives the quota a 2x margin at up to 50% holes:
            # expected non-null donors in the head = near_k * avail
            near_k = max(16, 4 * n_donors)
            stats = near_pairs.agg(
                F.count(F.lit(1)).alias("_n"),
                F.count_distinct(F.col("station_id")).alias("_s"),
            ).first()
            mean_near = stats["_n"] / stats["_s"] if stats["_s"] else 0.0
            avail = 1.0 - (frac if frac is not None else 1.0)
            near_cascade_k = (
                near_k
                if mean_near >= 2 * near_k
                and near_k * avail >= 2 * n_donors
                else None
            )

        # first-n-by-rank as a HASH AGGREGATE, not a sort window: the
        # candidate set is |donor facts| x |near neighbors| (tens of
        # millions at sf0.1, far more at scale), and a row_number window
        # forces a total sort of it; collect_list + array_sort + slice
        # computes the same top-n per (station, ts) group with partial
        # aggregation and no global sort. Median/donor-list then come
        # from the sliced array with JVM collection expressions (built
        # once per (value_cols, n) via the _topn_exprs memo — the three
        # _topn_best calls on the deep-fill path were rebuilding ~0.2 s
        # of py4j expression tree each).
        def _reg_cand(cand: DataFrame) -> DataFrame:
            for c in value_cols:
                cand = cand.withColumn(
                    f"_reg_{c}",
                    _regionalize("add", F.col(f"_nbv_{c}"),
                                 F.col("_ma_self"), F.col("_ma_nb"),
                                 round_digits),
                )
            return cand

        # only NULL-base rows consume a fill: below the hole-rate
        # threshold the near candidate stream is BUILT from the hole
        # keys (_hole_candidates) — at production hole rates (1-10%)
        # the |donors| x near expansion never exists for non-hole
        # timestamps. The far/cascade candidate streams are hole-driven
        # by construction already.
        all_holes = hole_keys

        def _topn_best(cand: DataFrame, n: int) -> DataFrame:
            top, meds, donors, ncand = _topn_exprs(value_cols, n)
            out = (
                _reg_cand(cand)
                .groupBy("station_id", ts_col)
                .agg(top)
            )
            for c in value_cols:
                out = out.withColumn(f"_med_{c}", meds[c])
            return out.withColumn("_donors", donors).withColumn(
                "_n_cand", ncand).drop("_top")

        # persisted: the union result AND the hole anti-join both consume
        # it — without the cache the whole near aggregation re-runs for
        # every cascade stage downstream of `targets`
        if near_cascade_k is None:
            best_near = scoped_persist(
                _topn_best(_cand(near_pairs), n_donors)
            )
            # r9 negative A/B: eagerly materializing this cache with a
            # count() before `targets` references it (to stop the
            # count-job/AQE-future pair racing the cold cache — event
            # log shows both computing the near-agg reduce concurrently)
            # measured NEUTRAL-to-worse interleaved (lazy 10.5/12.9
            # min/median vs eager 11.6/12.4): the racing stages share
            # the cores, so serializing them trades duplicate CPU for
            # an extra action's latency. Not adopted.
        else:
            # Near-side cascade for DENSE near sets (T's 100 km radius
            # can hold ~30 donors per station where only the first
            # n_donors=5 matter): aggregate the nearest near_cascade_k
            # ranks first; a timestamp that found >= n_donors candidates
            # there is FINAL — the knn rank orders by the same dist_m
            # the near threshold bounds, so the first n of a contiguous
            # rank prefix ARE the global first n (the far path's
            # contiguity argument, applied near). Only the unfilled
            # remainder re-aggregates against the complete near set,
            # hole-key-driven so the recompute stream is built from
            # exactly the keys that need it.
            near_head = near_pairs.filter(F.col("rank") <= near_cascade_k)
            best1 = scoped_persist(_topn_best(_cand(near_head), n_donors))
            done1 = best1.filter(F.col("_n_cand") >= n_donors)
            redo = hole_keys.join(
                done1.select("station_id", ts_col).hint("shuffle_hash"),
                ["station_id", ts_col], "left_anti",
            )
            best2 = _topn_best(
                _hole_candidates(redo, near_pairs, donor_facts, ts_col),
                n_donors,
            )
            best_near = scoped_persist(done1.unionByName(best2))
        targets = scoped_persist(all_holes.join(
            # shuffle-hash: sorting two fact-sized key streams for an
            # anti join buys nothing
            best_near.select("station_id", ts_col).hint("shuffle_hash"),
            ["station_id", ts_col], "left_anti",
        ))
        # count, not isEmpty: take(1) on an (often) empty shuffled frame
        # escalates through up to log4(partitions) probe jobs, each
        # re-running the anti-join's reduce side (measured: 5 jobs for
        # one probe at 32 shuffle partitions); count() is ONE job, and
        # it fully materializes the scoped_persist cache that the far
        # branch consumes anyway when targets is non-empty
        # (r9 interleaved A/B of the two forms on fillup_median_deep:
        # neutral — 14.48 vs 14.61 s min — so the one-job form stays)
        if targets.count() == 0:
            # every hole has at least one near donor (common: near_dist
            # is generous, e.g. T's 100 km) — the far machinery would
            # broadcast the big far-pair dim for nothing
            best = best_near
        elif cascade_k is None:
            # targets (the rare no-near-donor holes) is the SMALL side:
            # broadcast it, not the O(n x candidates) far pair set
            far_cand = far_pairs.join(F.broadcast(targets), "station_id").join(
                donor_facts, ["nb_station_id", ts_col]
            )
            best = best_near.unionByName(_topn_best(far_cand, 1))
        else:
            # far-rank = global rank - per-station near count: the knn rank
            # orders by the SAME dist_m the near/far threshold splits on,
            # so each station's far candidates hold exactly the contiguous
            # ranks (n_near+1, ...). A dim-sized count + broadcast join
            # replaces the row_number window this used to run — the window
            # shuffled AND sorted the whole far pair set (|stations|^2-ish)
            # just to renumber it.
            ncnt = near_pairs.groupBy("station_id").agg(
                F.count(F.lit(1)).alias("_ncnt")
            )
            far_aug = far_pairs.join(F.broadcast(ncnt), "station_id", "left").withColumn(
                "_ncnt", F.coalesce(F.col("_ncnt"), F.lit(0))
            )
            head = far_aug.filter(
                F.col("rank") <= F.col("_ncnt") + cascade_k
            ).drop("_ncnt")
            tail = far_aug.filter(
                F.col("rank") > F.col("_ncnt") + cascade_k
            ).drop("_ncnt")
            cand1 = targets.join(F.broadcast(head), "station_id").join(
                donor_facts, ["nb_station_id", ts_col]
            )
            best_f1 = scoped_persist(_topn_best(cand1, 1))
            targets2 = targets.join(
                best_f1.select("station_id", ts_col),
                ["station_id", ts_col], "left_anti",
            )
            cand2 = tail.join(F.broadcast(targets2), "station_id").join(
                donor_facts, ["nb_station_id", ts_col]
            )
            best = best_near.unionByName(best_f1).unionByName(
                _topn_best(cand2, 1)
            )
    elif cascade_k is None:
        best = (
            _select(_cand(pairs))
            .groupBy("station_id", ts_col)
            .agg(*_plain_aggs())
        )
    else:
        # see rank_fill: the pair dim feeds three joins; build it once
        pairs = scoped_persist(pairs)
        near_pairs = pairs.filter(F.col("rank") <= cascade_k)
        aggs = _plain_aggs()
        best1 = (
            _select(_cand(near_pairs))
            .groupBy("station_id", ts_col)
            .agg(*aggs)
        )
        # finalized: found the full donor quota among the nearest k — more
        # candidates cannot change the first-n-in-rank-order selection
        done1 = best1.filter(F.col("_n_near") >= n_donors)
        targets = (
            facts.filter(F.col(base_col).isNull())
            .select("station_id", ts_col)
            .join(done1.select("station_id", ts_col), ["station_id", ts_col], "left_anti")
        )
        far_targets = targets.join(F.broadcast(pairs), "station_id")
        best2 = (
            _select(far_targets.join(donor_facts, ["nb_station_id", ts_col]))
            .groupBy("station_id", ts_col)
            .agg(*aggs)
        )
        best = done1.unionByName(best2)
    best = best.drop("_n_near", "_n_cand")

    # shuffle-hash: see rank_fill's final-join note
    out = facts.join(best.hint("shuffle_hash"), ["station_id", ts_col], "left")
    for c, oc in zip(value_cols, out_cols):
        med = F.col(f"_med_{c}")
        if round_digits is not None:
            med = F.round(med, round_digits)
        # the reference's after-loop UPDATE overwrites ALL extra cols with
        # the donor median wherever filled (= base) is NULL — even a present
        # raw_min is replaced on a base-null row (StationT.py:138-143)
        out = out.withColumn(
            oc, F.when(F.col(base_col).isNull(), med).otherwise(F.col(c))
        )
    out = out.withColumn(
        "filled_by",
        F.when(F.col(base_col).isNull() & F.col(f"_med_{value_cols[0]}").isNotNull(),
               F.col("_donors")),
    )
    return out.drop(*[f"_med_{c}" for c in value_cols], "_donors")


def interpolate_gaps(
    facts: DataFrame,
    max_gap: str = "1 hour",
    value_col: str = "filled",
    filled_by_col: str = "filled_by",
    ts_col: str = "timestamp",
    round_digits: int | None = 2,
) -> DataFrame:
    """Linear interpolation of leftover holes bounded by ``max_gap``
    (StationBases.py:1494-1562; max gap config_default.ini:146-158).
    Interpolated rows get ``filled_by = -1``.

    Implemented with last/first ignorenulls windows: for each NULL row find
    the previous and next non-null (value, ts); fill
    ``prev + (next-prev) * (ts-prev_ts)/(next_ts-prev_ts)`` when the
    bracket span <= max_gap.

    Skew guard: the windows partition by (station, year), not station
    alone — a station-only window puts a multi-decade 10-min history in
    one task. Rows within ``max_gap`` of a year boundary are duplicated
    into the neighboring chunk as context, which is EXACT: a bracket
    wider than ``max_gap`` never fills, so context beyond it cannot
    change any output row. The one-chunk context covers at most one
    year-boundary crossing, so a ``max_gap`` over 365 days (far beyond
    any shipped knob) falls back to the plain per-station window — data
    that coarse cannot skew a partition anyway.
    """
    if filled_by_col not in facts.columns:
        facts = facts.withColumn(filled_by_col, F.lit(None).cast("short"))
    gap_s = {"1 hour": 3600, "2 days": 172800}.get(max_gap)
    if gap_s is None:
        num, unit = max_gap.split()
        gap_s = int(num) * {"hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
                            "minute": 60, "minutes": 60}[unit]

    if gap_s <= 365 * 86400:
        # (station, year) chunking with one-chunk context is exact only
        # while a fill-eligible bracket (span <= max_gap) can cross at
        # most ONE year boundary — guaranteed up to a 365-day max_gap
        union = year_chunked(facts, ts_col=ts_col, context_seconds=gap_s)
        part_cols = ("station_id", "_chunk")
    else:
        # a >1-year max_gap (no shipped config comes close — the knobs
        # are minutes to days) implies coarse data where a per-station
        # partition cannot skew; the plain window is then the exact path
        union = facts.withColumn("_chunk", F.lit(0)).withColumn(
            "_ctx", F.lit(False)
        )
        part_cols = ("station_id",)

    # Both brackets are RUNNING (UnboundedPreceding) frames, which Spark
    # evaluates incrementally in O(rows); "first non-null AFTER the row"
    # is expressed as a running last over DESCENDING order for the same
    # reason — the naive rowsBetween(1, unboundedFollowing) frame is
    # recomputed from scratch per row (UnboundedFollowingWindowFunction-
    # Frame), i.e. O(rows^2) per partition: measured ~10 min for ONE
    # 52k-row station-year vs seconds for the whole table this way.
    wb = W.partitionBy(*part_cols).orderBy(ts_col).rowsBetween(
        W.unboundedPreceding, -1
    )
    wf = W.partitionBy(*part_cols).orderBy(F.col(ts_col).desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    val_ts = F.when(F.col(value_col).isNotNull(), F.col(ts_col))

    out = (
        union.withColumn("_pv", F.last(value_col, ignorenulls=True).over(wb))
        .withColumn("_pt", F.last(val_ts, ignorenulls=True).over(wb))
        .withColumn("_nv", F.last(value_col, ignorenulls=True).over(wf))
        .withColumn("_nt", F.last(val_ts, ignorenulls=True).over(wf))
        .filter(~F.col("_ctx"))
        .drop("_chunk", "_ctx")
    )
    span = F.unix_timestamp("_nt") - F.unix_timestamp("_pt")
    frac = (F.unix_timestamp(ts_col) - F.unix_timestamp("_pt")) / span
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    if round_digits is not None:
        # ties-away round: the reference's interpolation UPDATE computes
        # in ::numeric and the numeric->int storage cast rounds ties away
        # (StationBases.py:1547-1551) — unlike the daily adjust's
        # float8->int rint cast (ties to even, see daily_adjust_p)
        interp = F.round(interp, round_digits)
    can = (
        F.col(value_col).isNull()
        & F.col("_pv").isNotNull()
        & F.col("_nv").isNotNull()
        & (span <= gap_s)
    )
    out = out.withColumn(
        filled_by_col,
        F.when(can, F.lit(-1).cast("short")).otherwise(F.col(filled_by_col)),
    ).withColumn(value_col, F.when(can, interp).otherwise(F.col(value_col)))
    return out.drop("_pv", "_pt", "_nv", "_nt")


def daily_adjust_p(
    ts_p: DataFrame,
    ts_p_d: DataFrame,
    peak_cap: float = 5.0,
    add_cap: float = 10.0,
    hard_cap: float = 50.0,
    round_digits: int = 2,
) -> DataFrame:
    """P-only step 7: scale each day's filled 10-min values so they sum to
    the daily station measurement (StationP.py:692-746).

    coef = daily_raw / sum(filled) per (ts - 5h 50min)::date, applied only
    where daily_raw is present, the 10-min sum > 0, and coef != 1
    (StationP.py:716-731). Per row (StationP.py:705-712):

    - both adjacent 10-min filled values are 0 (an isolated peak):
      LEAST(filled * coef, 5 mm) — scaling must not create a new peak;
    - else if the growth (filled*coef - filled) <= 10 mm:
      LEAST(filled * coef, 50 mm);
    - else: LEAST(filled + 10 mm, 50 mm).

    Rows with NULL filled or without a qualifying coef keep their values.
    """
    day = shifted_date(F.col("timestamp"), "5 hours 50 minutes")
    with_day = ts_p.withColumn("_day", day)
    sums = with_day.groupBy("station_id", "_day").agg(F.sum("filled").alias("_sum_f"))
    daily = ts_p_d.select(
        "station_id", F.col("timestamp").alias("_day"), F.col("raw").alias("_raw_d")
    )
    coefs = (
        sums.join(daily, ["station_id", "_day"])
        .filter(F.col("_raw_d").isNotNull() & (F.col("_sum_f") > 0))
        .withColumn("_coef", F.col("_raw_d") / F.col("_sum_f"))
        .filter(F.col("_coef") != 1)
    )
    out = with_day.join(
        coefs.select("station_id", "_day", "_coef"), ["station_id", "_day"], "left"
    )
    # adjacent 10-min filled values (pre-adjustment), reference tsb/tsa
    # joins. Skew guard: lag/lead only need the adjacent row, so the
    # window runs per (station, year) with 1-row boundary context
    # (functions.partitioning.year_chunked) — max task ~52.6k rows per
    # station-year instead of a station's full multi-decade history.
    union = year_chunked(out, context_rows=1)
    wts = W.partitionBy("station_id", "_chunk").orderBy("timestamp")
    prev_f = F.lag("filled").over(wts)
    next_f = F.lead("filled").over(wts)
    scaled = F.col("filled") * F.col("_coef")
    capped = F.when(
        (prev_f == 0) & (next_f == 0), F.least(scaled, F.lit(peak_cap))
    ).when(
        (scaled - F.col("filled")) <= add_cap, F.least(scaled, F.lit(hard_cap))
    ).otherwise(F.least(F.col("filled") + add_cap, F.lit(hard_cap)))
    adjusted = F.when(
        F.col("filled").isNotNull() & F.col("_coef").isNotNull(),
        # bround (half-even): the reference assigns the CASE result into
        # the scaled-INT filled column (StationP.py:703-713), an implicit
        # float->int cast that PostgreSQL performs with rint() — ties to
        # even. (Its explicit round()::int donor roundings are ties-away,
        # which F.round matches in _regionalize.) Property-tested against
        # the literal Python transcription of the CASE expression.
        F.bround(capped, round_digits),
    ).otherwise(F.col("filled"))
    return (
        union.withColumn("corr_base", adjusted)
        .filter(~F.col("_ctx"))
        .drop("_day", "_coef", "_chunk", "_ctx")
    )

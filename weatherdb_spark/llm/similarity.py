"""Embedding similarity search over an array<float> column.

Cosine is computed as dot/(sqrt(na)*sqrt(nb)) with a sequential
left-fold (F.aggregate) in double — bit-compatible with DuckDB's
``list_cosine_similarity`` on DOUBLE[] so oracles can verify exactly.
All JVM-side higher-order functions; no UDF.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from weatherdb_spark.functions.partitioning import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL for zero-norm vectors (padding docs, empty media embed to
    all-zeros at corpus scale): a plain divide is a DIVIDE_BY_ZERO task
    failure under ANSI mode. NULL similarity ranks last in the top-k
    window (DESC puts NULLs last) and fails every >= threshold — the
    right semantics for an undefined angle."""
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return F.try_divide(_dot(a, b), na * nb)


def brute_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small) query set
    against the corpus, window-rank per query.

    Scale: the corpus side streams (no shuffle before the rank); the rank
    is a per-query top-k that AQE executes as a partial top-k per
    partition. For self-join ANN over the whole corpus use
    :func:`lsh_bucket_topk`.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute): all pairs with
    cosine >= threshold. O(n^2) — correct baseline; the LSH variant is the
    scale path."""
    a = spread(embeddings).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def recall_vs_brute(
    approx: DataFrame,
    brute: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """recall@k per query: |approx top-k ∩ brute top-k| / k.

    The verification harness for the approximate ANN variants — joins the
    approximate result against the exact brute-force result so that a
    broken index (bad buckets, wrong probing) shows up as a recall drop.
    Returns (query_id, recall) with one row for EVERY query, 0.0 when the
    approximate search returned nothing for it.
    """
    hits = (
        brute.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / k).alias("recall"))
    )
    base = queries.select(F.col(id_col).alias("query_id"))
    return base.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )


def _plane_signs(plane: int, dim: int) -> list[float]:
    """Component signs of one deterministic hyperplane: +1/-1 by the
    parity of a Knuth-multiplicative hash of (p*dim + i). Pure function
    of (plane, i) — computed ONCE on the driver, not per row."""
    return [
        1.0 if ((plane * dim + i) * 2654435761) % 4294967296 < 2147483648
        else -1.0
        for i in range(dim)
    ]


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane sign bit of ``vec``.

    The signs are constants of (plane, i), so they enter the plan as a
    literal array instead of a per-row sequence+transform. Measured at
    sf0.1 this is wall-neutral (bucketing is ~0.3 s of the LSH pair
    query; the exact-cosine verify of the candidate set dominates) but
    it removes a per-row 64-element array allocation per plane that
    would matter at real corpus sizes. The DuckDB oracle mirrors the
    same formula, so bucket values are unchanged."""
    # numpy array, because classic PySpark expands lit(list) into
    # array(*[lit(item) ...]) — one py4j round-trip per element — while
    # lit(ndarray) converts in one call (measured 3.5x faster driver-side
    # plan build at 48 planes x 64 dims)
    signs = F.lit(np.array(_plane_signs(plane, dim)))
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def _with_bucket_signature(
    df: DataFrame, vec: str, planes: int, n_tables: int, dim: int,
    out: str = "_sig",
) -> DataFrame:
    """Add the ``n_tables``-element LSH bucket-signature array for
    ``vec``: bucket t packs the sign bits of hyperplanes
    [t*planes, (t+1)*planes).

    All (tables x planes) sign bits come from one sign-matrix literal +
    one transform — the same per-plane aggregate(zip_with(..)) float
    sums in the same order as :func:`_hyperplane_sign` (bucket values
    identical; the streaming twin and the mirrored DuckDB oracles still
    agree bit-for-bit), but the plan builds with 3 higher-order
    expressions instead of tables x planes aggregate/zip_with trees:
    the per-plane form spent ~4 s of DRIVER time just assembling the
    expression tree over py4j (measured at 48 planes). The matrix rows
    are numpy literals because classic PySpark expands lit(list) into
    per-element lit() round-trips while lit(ndarray) converts in one
    call (3.4 s -> 0.9 s for the 48 x 64 matrix). The remaining ~0.9 s
    build is memoized per (vec, planes, n_tables, dim, out): Column
    objects are immutable, plan-independent expression templates, so
    repeated callers (every CorpusStore append, every bench iteration)
    reuse one tree instead of re-assembling it over py4j."""
    bits, sig = _bucket_signature_exprs(vec, planes, n_tables, dim)
    return df.withColumn("_bits", bits).withColumn(out, sig).drop("_bits")


@lru_cache(maxsize=64)
def _bucket_signature_exprs(vec: str, planes: int, n_tables: int,
                            dim: int):
    """(bits, guarded signature) Columns — see
    :func:`_with_bucket_signature`; memoized per process."""
    sign_matrix = F.array(*[
        F.lit(np.array(_plane_signs(pl, dim)))
        for pl in range(n_tables * planes)
    ])
    bits = F.transform(
        sign_matrix,
        lambda plane: (
            F.aggregate(
                F.zip_with(F.col(vec), plane,
                           lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ) >= 0
        ).cast("int"),
    )
    sig = F.array(*[
        sum(
            [F.element_at(F.col("_bits"), t * planes + p + 1) * (2 ** p)
             for p in range(planes)],
            F.lit(0),
        )
        for t in range(n_tables)
    ])
    # Fail LOUDLY on a vector/dim mismatch instead of the silent
    # zero-recall failure mode: zip_with NULL-pads the shorter array, so
    # a wrong ``dim`` NULLs every projection and every bucket key, and
    # NULL keys never equi-join — candidates collapse to zero with no
    # error (the 2M-vector stress lap benched exactly that for two
    # rounds). NULL vectors keep their prior behavior (NULL signature,
    # row never joins); only a PRESENT vector of the wrong length
    # raises. One O(1) array-length check per row, folded into the
    # signature expression so the optimizer cannot prune it.
    ok = F.col(vec).isNull() | (F.size(F.col(vec)) == F.lit(dim))
    chk = F.assert_true(
        ok,
        F.concat(
            F.lit(f"LSH dim mismatch: expected {dim}-dim vectors in "
                  f"column {vec!r}, got length "),
            F.size(F.col(vec)).cast("string"),
            F.lit("; pass dim=<embedding length>"),
        ),
    )
    sig = F.when(chk.isNull(), sig)
    return bits, sig


#: k-means coarse-quantizer training cap: above this corpus size the fit
#: runs on a deterministic id-hash sample — the centroids only sketch the
#: distribution, while a full-corpus fit would pay several whole-corpus
#: passes.
IVF_TRAIN_MAX_ROWS = 100_000


def _numpy_kmeans(
    mat: "np.ndarray", n_cells: int, seed: int, iters: int = 20
) -> "np.ndarray":
    """Deterministic Lloyd k-means with k-means++ init, entirely
    driver-side (the training set is capped at IVF_TRAIN_MAX_ROWS, so
    this is a <=100k x dim float64 matmul loop). Fixed reduction order
    means the centroids are a pure function of (mat, seed) — unlike a
    distributed fit, whose partition-order float sums wiggle with the
    cluster layout. Returns an (n_cells, dim) float64 array."""
    rng = np.random.RandomState(seed)
    n = len(mat)
    if n == 0:
        raise ValueError("k-means training set is empty")
    if n <= n_cells:
        # every point its own centroid; pad by repeating the first row
        pad = np.repeat(mat[:1], n_cells - n, axis=0)
        return np.vstack([mat, pad])
    # k-means++ seeding
    centers = [mat[rng.randint(n)]]
    d2 = ((mat - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, n_cells):
        total = d2.sum()
        if total <= 0:
            centers.append(mat[rng.randint(n)])
            continue
        # clamp: float rounding can leave cumsum[-1] just under 1.0, and
        # a draw above it would index one past the end
        idx = min(np.searchsorted(np.cumsum(d2 / total), rng.rand()), n - 1)
        centers.append(mat[idx])
        d2 = np.minimum(d2, ((mat - centers[-1]) ** 2).sum(axis=1))
    c = np.array(centers)
    for _ in range(iters):
        # pairwise squared distances via |x|^2 - 2xC^T + |c|^2
        d = (
            (mat ** 2).sum(axis=1)[:, None]
            - 2.0 * mat @ c.T
            + (c ** 2).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        new_c = c.copy()
        for j in range(n_cells):
            members = mat[assign == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
        if np.allclose(new_c, c):
            break
        c = new_c
    return c


def _train_centroids(
    corp: DataFrame, n_cells: int, seed: int,
    id_col: str = "neighbor_id", vec_col: str = "_cv",
) -> "np.ndarray":
    """Deterministic coarse-quantizer training shared by :func:`ivf_topk`
    and :func:`build_ivf_index`: id-hash-sampled <= IVF_TRAIN_MAX_ROWS
    rows, collected SORTED BY ID (one Arrow transfer), then the
    fixed-reduction-order numpy k-means — centroids are a pure function
    of (corpus, seed). The count also materializes a surrounding
    scoped_persist, if any."""
    n = corp.count()
    train = corp
    if n > IVF_TRAIN_MAX_ROWS:
        # deterministic BY ID, unlike df.sample whose per-partition RNG
        # changes the training set with the partition layout
        every = -(-n // IVF_TRAIN_MAX_ROWS)  # ceil
        train = corp.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(every)) == 0
        )
    train_pdf = (
        train.select(id_col, F.col(vec_col).cast("array<double>"))
        .sort(id_col).toPandas()
    )
    mat = np.array([list(v) for v in train_pdf.iloc[:, 1]], dtype="float64")
    return _numpy_kmeans(mat, n_cells, seed)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``n_cells`` cells; each query scans only its
    ``n_probe`` nearest cells.

    The 100 TB shape: centroids train on a deterministic id-hash sample
    (<= IVF_TRAIN_MAX_ROWS rows, one Arrow transfer), the corpus shuffles
    once on cell id (building the inverted file), and query cost drops by
    ~n_cells/n_probe versus brute force.

    The quantizer is a driver-side numpy k-means, NOT pyspark.ml.KMeans:
    the ml fit aggregates float sums in partition order, so the same
    seed yields slightly different centroids under different
    partitioning — enough to flip a borderline cell assignment and make
    a recall gate flake between environments. Here the training matrix
    is collected sorted by id and every reduction runs in a fixed order:
    the centroids are a pure function of (corpus, seed).
    """
    from weatherdb_spark.functions.caching import scoped_persist

    corp = scoped_persist(spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ))
    centroids = _train_centroids(corp, n_cells, seed)

    # one 1-D ndarray literal per centroid (2-D literals are unsupported;
    # per-row lists would pay a py4j round-trip per element — see
    # _with_bucket_signature)
    centroid_array = F.array(*[F.lit(c) for c in centroids])

    def dists_to(vec):
        # squared Euclidean to every centroid
        return F.transform(
            centroid_array,
            lambda c: F.aggregate(
                F.zip_with(vec, c,
                           lambda x, cc: (x.cast("double") - cc)
                           * (x.cast("double") - cc)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )

    def nearest_cell(vec):
        d = dists_to(vec)
        # first position of the min = lowest cell id on exact ties
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    corp = corp.withColumn("_cell", nearest_cell(F.col("_cv")))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # n_probe nearest cells per query from the same distance array —
    # an array_sort of (dist, cell) structs replaces the old
    # crossJoin(centroids) + row_number window (no shuffle at all)
    cells = F.slice(
        F.array_sort(F.zip_with(
            dists_to(F.col("_qv")),
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
        )),
        1, n_probe,
    )
    q_cells = q.select(
        "query_id", "_qv",
        F.explode(F.transform(cells, lambda s: s["cell"])).alias("_cell"),
    )
    scored = (
        corp.join(F.broadcast(q_cells), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _sq_dists_to_centroids(vec: Column, centroids: "np.ndarray") -> Column:
    """Squared-Euclidean distance array to every centroid — THE single
    cell-assignment expression shared by :func:`build_ivf_index` and
    :func:`append_to_ivf_index`, so an appended vector's cell is
    bit-identical to the cell a fresh build at the same centroid set
    would assign (same sequential fold, same float order)."""
    centroid_array = F.array(*[F.lit(np.asarray(c, dtype="float64"))
                               for c in centroids])
    return F.transform(
        centroid_array,
        lambda c: F.aggregate(
            F.zip_with(vec, c,
                       lambda x, cc: (x.cast("double") - cc)
                       * (x.cast("double") - cc)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _nearest_cell(vec: Column, centroids: "np.ndarray") -> Column:
    d = _sq_dists_to_centroids(vec, centroids)
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


#: Broker table names of the persisted IVF serving index — the index
#: warehouse lives at ``index_path`` (its own MVCC snapshots, mutex,
#: vacuum), so writes are atomic manifest flips like every other table
#: in the engine instead of bare parquet appends.
IVF_CENTROIDS_TABLE = "ivf_centroids"
IVF_INVERTED_TABLE = "ivf_inverted"

#: Index-level manifest: ONE json file pinning the
#: (centroids_version, inverted_version) snapshot PAIR. Each table's own
#: manifest flip is atomic, but a rebuild flips TWO tables — a probe
#: that resolved the two per-table manifests between the flips would
#: read the new centroids with the old inverted file (cell ids computed
#: against different centroid sets: silently wrong neighbors). Probes
#: resolve this pair in one read instead, and every write path refreshes
#: it as its LAST step (one os.replace), so a concurrent probe sees
#: either the full old index or the full new one, never a mix — and a
#: crash anywhere before the pair flip leaves the old pair authoritative.
IVF_INDEX_MANIFEST = "_IVF_INDEX.json"


def _ivf_broker(spark, index_path: str):
    from weatherdb_spark.broker import Broker

    class _IvfBroker(Broker):
        """Broker whose snapshot cleanup honors the index-level pair
        manifest: a version pinned by :data:`IVF_INDEX_MANIFEST` is
        never reclaimed even when table writes have moved past it
        (repeated crashed rebuilds leave the pin more than one version
        behind) — the pin is a live reader contract, and reclaiming it
        would force probes onto the current-version fallback, which
        during a rebuild IS the torn mix this manifest exists to
        prevent. (The base broker's time-based retention additionally
        protects UNPINNED superseded snapshots that in-flight probes
        may still hold.)"""

        _IVF_PIN_KEYS = {
            IVF_CENTROIDS_TABLE: "centroids_version",
            IVF_INVERTED_TABLE: "inverted_version",
        }

        def _pinned_snapshot_versions(self, table):
            key = self._IVF_PIN_KEYS.get(table)
            if key is None:
                return set()
            pin = (_read_ivf_manifest(self.dir) or {}).get(key)
            return set() if pin is None else {pin}

    return _IvfBroker(spark, index_path)


def _read_ivf_manifest(index_path: str) -> "dict | None":
    """The pair manifest, or None when absent — or UNREADABLE: a
    corrupt/truncated file (external copy, disk-full) must degrade to
    the per-table-manifest fallback (current snapshots, the same
    row-consistent state single-table readers get), not make every
    probe, append, and cleanup crash until someone hand-deletes it.
    The writer's ``os.replace`` never leaves a torn file itself."""
    import json
    import logging
    import os

    try:
        with open(os.path.join(index_path, IVF_INDEX_MANIFEST)) as fh:
            return json.load(fh)
    except (FileNotFoundError, NotADirectoryError):
        return None
    except (json.JSONDecodeError, UnicodeDecodeError, OSError):
        logging.getLogger(__name__).warning(
            "unreadable IVF pair manifest at %s — falling back to the "
            "per-table manifests (current snapshots); the next index "
            "write rewrites it", index_path,
        )
        return None


def _flip_ivf_manifest(broker, index_path: str) -> None:
    """Atomically re-pin the index pair at the tables' CURRENT snapshot
    versions — the single commit point of every index write path (build/
    rebuild, append, compaction, migration). Runs while the writer holds
    the warehouse mutex, after all table snapshots are on disk. A no-op
    when there is no index to pin (e.g. compact_ivf_index pointed at an
    empty path): a null pair on disk would make every later probe take
    the manifest branch and die on the missing tables instead of the
    designed 'no IVF index' error."""
    import json
    import os
    from datetime import datetime, timezone

    pair = {
        "centroids_version": broker.table_version(IVF_CENTROIDS_TABLE),
        "inverted_version": broker.table_version(IVF_INVERTED_TABLE),
    }
    if pair["centroids_version"] is None or pair["inverted_version"] is None:
        return
    mp = os.path.join(index_path, IVF_INDEX_MANIFEST)
    tmp = mp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {**pair,
             "written_at": datetime.now(timezone.utc).isoformat()},
            fh,
        )
    os.replace(tmp, mp)  # atomic pair flip


def _pinned_version(broker, table: str, pinned: "int | None") -> "int | None":
    """The pinned snapshot if it is still on disk, else None (= current).
    The fallback covers the one benign race: vacuum reclaims superseded
    snapshots before refreshing the pair manifest, and compaction is
    content-preserving — reading current there is row-identical."""
    import os

    if pinned is None:
        return None
    vdir = os.path.join(broker.path(table), broker._version_dirname(pinned))
    return pinned if os.path.isdir(vdir) else None


def _ivf_frames(spark, index_path: str) -> "tuple[DataFrame, DataFrame]":
    """(centroids, inverted) of the index at ``index_path`` — resolved
    through the index-level pair manifest when present (one read pins a
    CONSISTENT snapshot pair even while a rebuild is mid-flip), else the
    per-table MVCC manifests (pre-r9 index; the first write refreshes
    the pair), else the pre-r8 raw-parquet layout (``centroids/`` +
    ``inverted/`` directly under the path; read-only — the first append
    migrates it)."""
    import os

    b = _ivf_broker(spark, index_path)
    pair = _read_ivf_manifest(index_path)
    # the existence check guards against a stale/foreign pair file next
    # to no actual tables — fall through to the 'no IVF index' error
    if pair is not None and b.exists(IVF_INVERTED_TABLE):
        cv = _pinned_version(b, IVF_CENTROIDS_TABLE,
                             pair.get("centroids_version"))
        iv = _pinned_version(b, IVF_INVERTED_TABLE,
                             pair.get("inverted_version"))
        return (
            b.read(IVF_CENTROIDS_TABLE, version=cv),
            b.read(IVF_INVERTED_TABLE, version=iv),
        )
    if b.exists(IVF_INVERTED_TABLE):
        return b.read(IVF_CENTROIDS_TABLE), b.read(IVF_INVERTED_TABLE)
    legacy = os.path.join(index_path, "inverted")
    if not os.path.isdir(legacy):
        raise ValueError(f"no IVF index at {index_path}")
    return (
        spark.read.parquet(os.path.join(index_path, "centroids")),
        spark.read.parquet(legacy),
    )


def _migrate_legacy_ivf(spark, broker, index_path: str) -> None:
    """One-time rewrite of a pre-r8 raw-parquet index into the broker
    layout (cell-partitioned snapshot + manifest): one full data pass,
    never again. The raw dirs are removed after the flip — from then on
    every reader resolves through the manifest."""
    import os
    import shutil

    cent = spark.read.parquet(os.path.join(index_path, "centroids"))
    inv = spark.read.parquet(os.path.join(index_path, "inverted"))
    broker.write(IVF_CENTROIDS_TABLE, cent)
    broker.write(IVF_INVERTED_TABLE, inv, partition_cols=("cell",))
    _flip_ivf_manifest(broker, index_path)
    for d in ("centroids", "inverted"):
        shutil.rmtree(os.path.join(index_path, d), ignore_errors=True)


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: "np.ndarray | None" = None,
) -> None:
    """Persist an IVF index: train the deterministic coarse quantizer
    ONCE, then write two BROKER tables under ``path`` (the index is its
    own little MVCC warehouse — atomic manifest flips, warehouse mutex,
    previous-snapshot retention for in-flight probes, vacuum):

    - :data:`IVF_CENTROIDS_TABLE`: (cell, centroid array<double>).
    - :data:`IVF_INVERTED_TABLE`: the corpus with its cell id,
      partitioned by ``cell`` so a probe scans only its cells'
      directories (partition pruning).

    The 100 TB shape: :func:`ivf_topk` re-trains and re-shuffles the
    corpus on EVERY query batch — right for ad-hoc exploration, wasteful
    for a serving corpus probed thousands of times. Building the
    inverted file once amortizes the corpus shuffle across every later
    :func:`ivf_topk_indexed` call, which reads only
    ~n_probe/n_cells of the data via partition pruning.

    ``centroids`` skips training and quantizes against the GIVEN
    (n_cells, dim) array — the rebuild path (re-layout a fragmented
    index without moving its cell boundaries) and the reference frame
    for :func:`append_to_ivf_index`'s identity contract.

    REBUILD over a live index is cross-table atomic: the two table
    snapshots land first (each its own MVCC flip), and the index-level
    pair manifest (:data:`IVF_INDEX_MANIFEST`) re-pins
    (centroids_version, inverted_version) as the LAST step — one
    ``os.replace``. A probe concurrent with the rebuild resolves the
    pair in one read and sees either the full old index or the full new
    one, never new centroids with the old inverted file; a crash
    anywhere before the pair flip leaves the old index authoritative
    (the superseded-but-unpinned table snapshots are re-written on the
    retry). Rebuilds serialize with appends under the warehouse mutex.
    """
    from weatherdb_spark.functions.caching import scoped_persist

    # persisted: _train_centroids' count materializes it, and the
    # training collect + cell-assignment write reuse it — without the
    # persist the full embeddings source would be recomputed three times
    corp = scoped_persist(spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ))
    if centroids is None:
        centroids = _train_centroids(corp, n_cells, seed)
    spark = embeddings.sparkSession
    b = _ivf_broker(spark, path)
    with b.activate():
        b.write(IVF_CENTROIDS_TABLE, spark.createDataFrame(
            [(int(i), [float(x) for x in c])
             for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        ).coalesce(1))
        b.write(
            IVF_INVERTED_TABLE,
            corp.withColumn("cell", _nearest_cell(F.col("_cv"), centroids)),
            partition_cols=("cell",),
        )
        _flip_ivf_manifest(b, path)


def append_to_ivf_index(
    spark,
    index_path: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally grow a persisted IVF index (a serving corpus that
    keeps ingesting): assign the new vectors to cells with the STORED
    centroids — no retrain, no full-corpus shuffle, no data read of the
    existing inverted file — and land them via
    :meth:`~weatherdb_spark.broker.Broker.write_partition_merge`: a NEW
    snapshot in which the batch's rows are fresh files inside their
    ``cell=N/`` leaves and every existing file hard-links
    byte-identically. Cost is O(batch) — and unlike a bare parquet
    ``mode("append")`` the write is CRASH-SAFE and READER-ISOLATED: the
    atomic manifest flip means a concurrent probe plans over either the
    old snapshot or the new one, never a half-written bag, and a crash
    mid-append leaves the old snapshot authoritative (the torn version
    dir is swept on the retry). Appends run under the index warehouse
    mutex, so two writers serialize instead of interleaving.

    Identity contract: because the assignment reuses the exact build
    expression (:func:`_sq_dists_to_centroids` — same sequential float
    fold, same lowest-cell tie-break), probes against the appended
    index return rows identical to :func:`build_ivf_index` run fresh
    over the union at the same centroid set. The centroids do NOT
    drift toward the new data — the standard IVF serving trade-off;
    :func:`check_ivf_index` watches the drift and recommends the
    rebuild (a fresh :func:`build_ivf_index` retrains). Appending an id
    already in the index duplicates it (the index is a bag, like the
    build's input). Repeated appends accumulate small files per touched
    cell; :func:`compact_ivf_index` folds them (row-identical probes).

    A pre-r8 raw-parquet index migrates into the broker layout on its
    first append (one full pass, never again).
    """
    b = _ivf_broker(spark, index_path)
    with b.activate():
        if not b.exists(IVF_INVERTED_TABLE):
            _migrate_legacy_ivf(spark, b, index_path)
        cent_rows = b.read(IVF_CENTROIDS_TABLE).sort("cell").collect()
        centroids = np.array([list(r.centroid) for r in cent_rows],
                             dtype="float64")
        new = spread(new_embeddings).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        )
        b.write_partition_merge(
            IVF_INVERTED_TABLE,
            new.withColumn("cell", _nearest_cell(F.col("_cv"), centroids)),
            "cell",
        )
        _flip_ivf_manifest(b, index_path)


def compact_ivf_index(spark, index_path: str) -> dict:
    """Per-cell file compaction for an appended serving index — the
    :meth:`CorpusStore.compact_epochs` twin: every
    :func:`append_to_ivf_index` adds files to its touched ``cell=N/``
    leaves, and after thousands of appends probe planning pays per-file
    costs that dwarf the data. Delegates to the index warehouse's
    :meth:`~weatherdb_spark.broker.Broker.vacuum` (rewrites a table to
    one file per leaf when any leaf exceeds the threshold, preserving
    the cell partition dirs — probes stay partition-pruned and
    row-identical) and reclaims superseded snapshots. Returns vacuum's
    ``{table: (files_before, files_after)}``. Call at maintenance
    cadence; a no-op on a compact index. A pre-r8 raw-parquet index
    migrates into the broker layout first (as the append does) —
    vacuuming the raw dirs as if they were broker tables would version
    them under the LEGACY names and strand every reader."""
    import os

    b = _ivf_broker(spark, index_path)
    with b.activate():
        if not b.exists(IVF_INVERTED_TABLE) and os.path.isdir(
                os.path.join(index_path, "inverted")):
            _migrate_legacy_ivf(spark, b, index_path)
        # vacuum compacts into fresh snapshots (the pinned pair and any
        # reader-retained superseded versions survive cleanup: the pin
        # + the broker's time-based retention), then the flip re-pins
        # the compacted — content-identical — pair
        res = b.vacuum()  # reentrant under the held mutex
        _flip_ivf_manifest(b, index_path)
    return res


def check_ivf_index(
    spark, index_path: str, max_top_share: float | None = None,
) -> dict:
    """The maintenance DECISION on top of :func:`ivf_cell_stats`:
    appends assign against FROZEN centroids, so a drifting ingest
    distribution piles into few cells and probe cost quietly climbs
    toward a scan of those cells. This check turns the drift story into
    an invariant: rebuild is recommended when the most populated cell
    holds more than ``max_top_share`` of the vectors (default
    ``4 / n_cells`` — four times the balanced share, comfortably above
    k-means' natural imbalance on clustered data but far below a
    degenerate pile-up). Returns a dict with ``rebuild_recommended``,
    the top cell and its share, and the threshold used; wire the
    rebuild itself as a fresh :func:`build_ivf_index` (retrains). CLI:
    ``weatherdb-spark check-ivf-index --index-path ...``."""
    stats = ivf_cell_stats(spark, index_path).collect()
    n_cells = len(stats)
    if max_top_share is None:
        max_top_share = min(1.0, 4.0 / max(n_cells, 1))
    elif not 0 < max_top_share <= 1:
        raise ValueError(
            f"max_top_share must be in (0, 1], got {max_top_share}"
        )
    n_vectors = sum(r.n_vectors for r in stats)
    top = max(stats, key=lambda r: (r.n_vectors, -r.cell), default=None)
    top_share = (top.n_vectors / n_vectors) if (top and n_vectors) else 0.0
    return {
        "rebuild_recommended": bool(n_vectors and top_share > max_top_share),
        "top_cell": int(top.cell) if top else None,
        "top_share": round(top_share, 6),
        "max_top_share": round(float(max_top_share), 6),
        "n_cells": n_cells,
        "n_vectors": int(n_vectors),
    }


def ivf_cell_stats(spark, index_path: str) -> DataFrame:
    """Per-cell population of a persisted IVF index: (cell, n_vectors,
    share) for every centroid, zero-filled — the observability
    companion to :func:`append_to_ivf_index` (appends assign against
    FROZEN centroids, so a drifting ingest distribution piles into few
    cells and probe cost quietly climbs toward a scan of those cells).
    Read it at maintenance cadence; a top-cell share far above
    ~1/n_cells says rebuild (:func:`build_ivf_index` retrains). The
    count aggregates the cell PARTITION COLUMN only — parquet scans no
    data pages."""
    cent_full, inv = _ivf_frames(spark, index_path)
    cent = cent_full.select("cell")
    counts = inv.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = F.sum("n_vectors").over(W.partitionBy())  # n_cells-sized dim
    return (
        cent.join(counts, "cell", "left")
        .withColumn("n_vectors", F.coalesce("n_vectors", F.lit(0)))
        .withColumn("share", F.round(F.col("n_vectors") / total, 6))
        .orderBy("cell")
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over a PERSISTED IVF index (see
    :func:`build_ivf_index`): probe-cell selection runs driver-side on
    the dim-sized query batch (one Arrow transfer of the query vectors +
    the n_cells centroid rows), so the inverted-file scan carries a
    STATIC ``cell IN (...)`` predicate — Spark prunes the non-probed
    partition directories before reading a byte. Results are identical
    to :func:`ivf_topk` at the same (corpus, seed): same centroids (pure
    function), same lowest-cell tie-breaks, same exact-cosine rank.
    """
    from pyspark.sql import types as T

    cent_df, inv_full = _ivf_frames(spark, index_path)
    cent_rows = cent_df.sort("cell").collect()
    centroids = [list(r.centroid) for r in cent_rows]
    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).sort("query_id").collect()

    def _sqdist(q, c):
        # SEQUENTIAL fold, mirroring ivf_topk's zip_with/aggregate
        # expression op-for-op (python float == JVM double): a numpy
        # |q|^2 - 2qC + |c|^2 expansion rounds differently at ~1e-13
        # relative, enough to flip near-equidistant probe cells and
        # break the 'identical to ivf_topk' contract
        acc = 0.0
        for x, y in zip(q, c):
            diff = x - y
            acc += diff * diff
        return acc

    probe = [
        sorted(range(len(centroids)),
               key=lambda ci, q=r._qv: (_sqdist(q, centroids[ci]), ci))[:n_probe]
        for r in q_rows
    ]
    probe_cells = sorted({int(c) for row in probe for c in row})

    # the query id keeps its source type (string/int/...) — ivf_topk
    # preserves it end-to-end and this path must be a drop-in
    schema = T.StructType([
        T.StructField("query_id", queries.schema[id_col].dataType),
        T.StructField("_qv", T.ArrayType(T.DoubleType())),
        T.StructField("cell", T.IntegerType()),
    ])
    q_cells = spark.createDataFrame(
        [
            (r.query_id, [float(x) for x in r._qv], int(c))
            for r, row in zip(q_rows, probe)
            for c in row
        ],
        schema,
    )
    inv = inv_full.filter(
        F.col("cell").isin(probe_cells)  # static -> partition pruning
    )
    scored = (
        inv.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 6,
    dim: int = 64,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent random-hyperplane
    LSH tables; candidates are the union of the query's bucket across
    tables, then exact rank over the candidate set.

    A single table misses near neighbors that differ on any one plane
    (P[same bucket] = (1 - theta/pi)^planes); multiple independent tables
    recover them at the standard OR-construction rate
    1 - (1 - p^planes)^n_tables. At 100 TB the corpus explodes x n_tables
    and shuffles ONCE on the (table, bucket) key; each query probes
    n_tables buckets instead of the full corpus.

    ``max_bucket_docs`` (default None = uncapped) bounds each corpus
    (table, bucket) group to its first N residents by ascending id — a
    duplicate-heavy corpus collapses many vectors into one bucket and a
    query probing it would otherwise scan the whole clump; with the cap
    the per-query candidate count is <= n_tables * max_bucket_docs. Not
    silent: logged on activation, quantifiable with
    :func:`weatherdb_spark.llm.bucketing.bucket_overflow`.
    """
    from weatherdb_spark.llm.bucketing import cap_bucket_residents
    def bucketed(df: DataFrame) -> DataFrame:
        # one row per table: bucket from that table's plane block; the
        # full signature rides along for the map-side cross-table dedup
        return _with_bucket_signature(df, "_v", planes, n_tables, dim).select(
            "*", F.posexplode(F.col("_sig")).alias("_table", "_bucket")
        )

    c = bucketed(
        spread(embeddings).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        )
    ).withColumnsRenamed({"_v": "_cv", "_sig": "_cs"})
    c = cap_bucket_residents(c, ["_table", "_bucket"], "neighbor_id", max_bucket_docs)
    q = bucketed(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v"))
    ).withColumnsRenamed({"_v": "_qv", "_sig": "_qs"})
    # a (query, neighbor) pair colliding in several tables is kept only
    # in its FIRST matching table — same distinct candidate set as a
    # dropDuplicates, but as a map-side filter: the candidate stream
    # with its two vector payloads is never exchanged for a grouping
    # (see cosine_pairs_lsh)
    first_match = F.array_position(
        F.zip_with(F.col("_qs"), F.col("_cs"), lambda a, bb: a == bb),
        True,
    )
    candidates = (
        c.join(F.broadcast(q), ["_table", "_bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(first_match == F.col("_table") + 1)
        .select("query_id", "_qv", "neighbor_id", "_cv")
    )
    scored = candidates.withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def cosine_bucket_overflow(
    embeddings: DataFrame,
    cap: int,
    planes: int = 3,
    dim: int = 64,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-bucket overflow report for :func:`cosine_pairs_lsh` /
    :func:`lsh_bucket_topk` with ``max_bucket_docs=cap``: one row per
    (table, bucket) whose population exceeds the cap, with the
    denied-resident count — the 'no silent caps' companion (pass the
    SAME planes/n_tables/dim as the capped run; the hyperplanes are
    deterministic, so this rebuilds the identical bucket stream). Empty
    result == the cap never engaged."""
    from weatherdb_spark.llm.bucketing import bucket_overflow

    b = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    bucketed = _with_bucket_signature(b, "_v", planes, n_tables, dim).select(
        "_id", F.posexplode(F.col("_sig")).alias("table", "bucket")
    )
    return bucket_overflow(bucketed, ["table", "bucket"], cap)


def cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 3,
    dim: int = 64,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed — the scale
    path for :func:`cosine_pairs` (which stays the O(n^2) oracle).

    Multi-table random-hyperplane OR-construction: the corpus explodes
    x ``n_tables`` onto (table, bucket) keys (one shuffle); candidate
    pairs share a bucket in at least one table; exact cosine verifies,
    so precision is 1 and recall is the standard
    1 - (1 - p^planes)^n_tables with p = 1 - theta/pi — tune
    planes/n_tables per threshold (fewer planes -> bigger buckets ->
    higher recall, more candidates). Hot buckets are bounded by 2^planes
    buckets per table; at 100 TB add a per-bucket cap or more planes.

    Cross-table dedup is a MAP-SIDE filter, not a dropDuplicates: both
    sides carry their full ``n_tables`` bucket-signature array, and a
    pair is kept only in the FIRST table whose buckets collide
    (``array_position`` over the zipped equality). Same distinct pair
    set, but the candidate stream — |pairs| x duplication x two
    64-float payload vectors, the single biggest intermediate here —
    is never exchanged for a grouping; only the dim-per-row bucketed
    stream shuffles for the join.

    ``max_bucket_docs`` (default None = uncapped) bounds the hot-bucket
    quadratic: the LEFT (smaller-id) side of each (table, bucket) group
    keeps only its first N residents by ascending id, so a bucket of B
    near-identical vectors yields O(N*B) candidates instead of O(B^2) —
    the batch twin of the streaming ``max_bucket_docs``
    (``streaming/neardup.py``), where a full bucket stops accumulating
    residents but still compares arrivals against them. A pair whose
    smaller id is not a resident of the FIRST table whose buckets
    collide is dropped (the first-match dedup decides the owning table
    from the un-capped signatures). Not silent: logged on activation,
    quantifiable with
    :func:`weatherdb_spark.llm.bucketing.bucket_overflow`.
    """
    from weatherdb_spark.llm.bucketing import cap_bucket_residents

    b = spread(embeddings).select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # The vectors deliberately RIDE THROUGH the bucket join: an
    # ids-only candidate stream with a post-dedup join-back to fetch
    # vectors measured 2x SLOWER at sf0.1 (two extra 1.5M-row joins
    # cost more than the wider exchange, which compresses well).
    # r9 re-decided this at REAL scale (tools/ab_lsh_fetch.py: 2M
    # vectors, the corpus_stress semantic_dedup parameters, outputs
    # hash-verified identical, both arm orders, two graph shapes):
    # dense graph (142M pairs) ship 266/299 s vs id-fetch 303/548 s;
    # clustered graph (241k pairs) ship 300/349 s vs id-fetch
    # 517/517 s. The structural reason the fetch-back cannot win here:
    # the heavy stream is the CANDIDATE verify stream (every bucket
    # cohabitation, pre-cos), not the verified-pair output, and every
    # candidate needs both vectors for the exact verify — so vectors
    # reach candidates either via the one exploded exchange (corpus x
    # n_tables rows) or via two join-backs onto the candidate stream,
    # which at LSH bucket widths is 10-30x LARGER than the explode.
    # Guide-8 "move payloads once" applies only when the decision
    # stream is smaller than the payload stream; verified-LSH pair
    # generation is the opposite. The vector NORM rides too: computed once per corpus
    # row, so the per-pair verify does ONE dot product instead of
    # three — and since the division pairs the identical
    # sqrt(dot(v, v)) factors, the cos values are bit-identical to the
    # inline form.
    # persisted pre-explode: the self-join's two sides are DIFFERENT
    # projections (one streams, one broadcasts), so exchange reuse
    # cannot collapse them and each would re-run the whole signature
    # chain — the 48 interpreted plane projections + norm per corpus
    # row, i.e. a second full corpus pass at scale. The cached base is
    # corpus-sized (vector + n_tables ints + one double per row); the
    # x n_tables explode stays lazy on top of it.
    from weatherdb_spark.functions.caching import scoped_persist

    base = scoped_persist(
        _with_bucket_signature(b, "_v", planes, n_tables, dim)
        .withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    )
    bucketed = base.select(
        "_id", "_v", "_sig", "_norm",
        F.posexplode(F.col("_sig")).alias("_table", "_bucket"),
    )
    lhs = bucketed.select(
        "_table", "_bucket", F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"), F.col("_sig").alias("_sa"),
        F.col("_norm").alias("_na"),
    )
    lhs = cap_bucket_residents(lhs, ["_table", "_bucket"], "id_a", max_bucket_docs)
    rhs = bucketed.select(
        "_table", "_bucket", F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_sig").alias("_sb"),
        F.col("_norm").alias("_nb"),
    )
    first_match = F.array_position(
        F.zip_with(F.col("_sa"), F.col("_sb"), lambda a, bb: a == bb),
        True,
    )
    cos = F.try_divide(
        _dot(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb")
    )
    return (
        lhs.join(rhs, ["_table", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match == F.col("_table") + 1)
        .withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 3,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_docs: int | None = None,
    keep_by: str | None = None,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    cosine near-dup pairs (LSH-bucketed, exact-verified — precision 1)
    -> connected components -> one kept representative per semantic
    group. Returns (id_col, component_id, group_size, is_kept) for
    every vector that belongs to a near-dup group; a training pipeline
    drops the ``~is_kept`` rows.

    The kept representative is the smallest id (= the component label)
    by default. ``keep_by`` names a ranking column on ``embeddings``
    (e.g. a quality score): the keeper is then the group member with
    the HIGHEST ``keep_by`` value, ties (and an all-NULL group) broken
    by smallest id — SemDeDup-style curation keeps the best of each
    semantic clump, not an arbitrary one. Implemented as two hash
    aggregates over the component dim (max value, then min id at that
    value — NULL-safe) — no window, so a pathological corpus-sized
    clump never lands in one task; the keeper dim is component-count-
    sized and broadcasts.

    ``dim`` MUST equal the embedding array length: it sizes the LSH
    hyperplanes the pair stage hashes with, and a mismatch raises at
    run time (``_with_bucket_signature``'s guard; before r10 a
    mismatch silently produced zero pairs).

    Pure composition of two scale-audited stages: the pair generation
    is :func:`cosine_pairs_lsh` (one (table, bucket) shuffle, hot
    buckets boundable via ``max_bucket_docs``), the grouping is
    :func:`~weatherdb_spark.llm.dedup.connected_components`
    (auto-sized: driver union-find for sketch-sized edge lists,
    min-label propagation beyond). The group-size dim is
    component-count-sized and broadcasts.
    """
    from weatherdb_spark.llm.dedup import connected_components

    # dim passes straight through to the pair stage's hyperplane
    # signatures and MUST match the vector length. Found in r9 when the
    # 2M-vector stress lap (32-dim vectors, the old implicit dim=64)
    # silently benched a zero-pair pipeline for two rounds; since r10 a
    # mismatch raises at run time (_with_bucket_signature's guard) —
    # tests/test_llm_similarity.py pins both directions.
    pairs = cosine_pairs_lsh(
        embeddings,
        threshold=threshold,
        planes=planes,
        n_tables=n_tables,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket_docs=max_bucket_docs,
        dim=dim,
    ).select("id_a", "id_b")
    comp = connected_components(pairs)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    out = comp.join(F.broadcast(sizes), "component_id")
    if keep_by is None:
        return out.select(
            F.col("doc_id").alias(id_col),
            "component_id",
            "group_size",
            (F.col("doc_id") == F.col("component_id")).alias("is_kept"),
        )
    ranked = out.join(
        embeddings.select(F.col(id_col).alias("doc_id"),
                          F.col(keep_by).alias("_kb")),
        "doc_id",
    )
    best = ranked.groupBy("component_id").agg(F.max("_kb").alias("_bq"))
    keeper = (
        ranked.join(F.broadcast(best), "component_id")
        # eqNullSafe: a group whose every _kb is NULL has _bq NULL and
        # must still elect a keeper (its smallest id), not drop all rows
        .filter(F.col("_kb").eqNullSafe(F.col("_bq")))
        .groupBy("component_id")
        .agg(F.min("doc_id").alias("_keeper"))
    )
    return ranked.join(F.broadcast(keeper), "component_id").select(
        F.col("doc_id").alias(id_col),
        "component_id",
        "group_size",
        (F.col("doc_id") == F.col("_keeper")).alias("is_kept"),
    )

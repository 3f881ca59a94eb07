"""The decode job: block table -> original rows, bit-identical.

Mirrors the reference's round-trip contract (decode(encode(x)) == x,
naive.rs golden tests) at table scale: every column is reproduced
byte-identical per url — the north-rule invariant. Each bucket decodes
independently (blocks are self-describing), so decode parallelism ==
bucket count and no shuffle is needed beyond the scan's grouping.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import codecs, manifest
from ..kernels import bloom as bloomkern
from .encode import assert_utc_session, committed_wave_paths

_SPARK_TYPE = manifest.SPARK_DDL_TYPES  # canonical copy lives in manifest


def decode_table(spark: SparkSession, out_dir: str, buckets: list[int] | None = None,
                 columns: list[str] | None = None,
                 version: int | None = None,
                 filters: list[tuple] | None = None) -> DataFrame:
    """Decode the store (optionally bucket- and column-projected, and
    optionally AS OF a past manifest version — time travel over the
    immutable version chain: the read sees exactly the waves that
    version's commit published, Iceberg snapshot-read semantics. A
    version whose wave dirs were since compacted away and reclaimed
    fails at scan time, like reading an expired Iceberg snapshot).

    `columns` is the block-store analogue of parquet column pruning:
    the projection is pushed BELOW the bucket shuffle as a filter on the
    block rows' `column` field, so unwanted payloads (html/text are the
    bulk of every block) are neither read into the shuffle nor
    decompressed — decoding one column of a 10^12-row snapshot moves
    ~1/n_cols of the bytes. Output column order follows the manifest
    schema.

    `filters` ((col, op, value) triples, ANDed) are evaluated INSIDE
    the decode kernel (late materialization — see decode_blocks_df);
    filter columns must survive the `columns` projection. scan_table
    is the user surface that combines this with zone-map bucket
    pruning; here the kernel filter alone still bounds what crosses
    the Arrow boundary."""
    m = manifest.load(out_dir, version=version)
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    full = manifest.ordered_schema(m)  # {column: type}, input order
    if columns is not None:
        if not columns:
            raise ValueError("columns projection must not be empty")
        unknown = [c for c in columns if c not in full]
        if unknown:
            raise KeyError(f"columns not in snapshot schema: {unknown}")
        schema = {c: t for c, t in full.items() if c in set(columns)}
    else:
        schema = full
    assert_utc_session(spark, schema)
    cols = list(schema.keys())

    # schema evolution: buckets committed before an evolve_schema call
    # have no block for the added columns — decode null-fills them from
    # the manifest's per-bucket column sets (Iceberg read-as-null)
    missing = (
        manifest.missing_columns(
            # bucket-restricted reads also restrict the spilled stats
            # files opened (wave-level pruning; a point lookup on an
            # evolved 10^5-bucket snapshot opens ~1 file, not all)
            m, cols, blocks=manifest.block_stats(out_dir, m, buckets=buckets)
        )
        if m.get("evolved")  # never-evolved: skip the stats read entirely
        else {}
    )
    dec_schema = dict(schema)
    anchor = None
    if missing and columns is not None:
        key = m.get("key")
        # a projection of ONLY evolved columns would leave old buckets
        # with zero block rows (their row count unknowable) — anchor on
        # the key column, which every non-empty bucket has, then drop it
        if key in full and key not in dec_schema and any(
            miss >= set(cols) for miss in missing.values()
        ):
            anchor = key
            dec_schema[key] = full[key]
    out_schema = ", ".join(f"`{c}` {_SPARK_TYPE[t]}" for c, t in dec_schema.items())

    # manifest-level wave pruning first (skip whole data dirs), then the
    # bucket predicate prunes parquet row groups inside the survivors
    paths = committed_wave_paths(out_dir, m, buckets=buckets)
    if not paths:
        df = spark.createDataFrame([], out_schema)
        return df.select(*cols) if anchor else df
    blocks = spark.read.parquet(*paths)
    if buckets is not None:
        blocks = blocks.filter(blocks.bucket.isin(buckets))
    if columns is not None and len(dec_schema) < len(full):
        blocks = blocks.filter(blocks.column.isin(list(dec_schema)))
    norm = None
    if filters:
        from .. import zonemap

        norm = zonemap.normalize_filters(filters, schema)
    gen_key = None
    gen_missing = None
    if m.get("streamed"):
        # streamed stores hold several GENERATIONS of a bucket (one per
        # appended wave file); grouping on (bucket, file) decodes each
        # generation independently and the rows union — the same
        # isolation decode_colocated gets for free from its one-file-
        # per-partition scan
        from pyspark.sql import functions as F

        blocks = blocks.withColumn("_gen", F.input_file_name())
        gen_key = "_gen"
        # per-generation evolution allowance: a generation written
        # AFTER a column was added must carry its block — missing then
        # means corruption, not evolution, and the kernel raises
        gen_missing = manifest.wave_allowance(m, cols)
    df = decode_blocks_df(blocks, dec_schema, out_schema, norm_filters=norm,
                          missing=missing, gen_key=gen_key,
                          gen_missing=gen_missing)
    return df.select(*cols) if anchor else df


def _wave_of(file_path: str) -> str:
    """Wave dir basename from a block file path/URI — the key
    manifest.wave_allowance maps generations by."""
    return file_path.rstrip("/").rsplit("/", 2)[-2]


def decode_blocks_df(blocks: DataFrame, schema: dict[str, str], out_schema: str,
                     norm_filters: list[tuple] | None = None,
                     missing: dict[int, set] | None = None,
                     gen_key: str | None = None,
                     gen_missing: dict[str, set] | None = None) -> DataFrame:
    """block rows -> original rows; Arrow path when available.

    `norm_filters` (zonemap.normalize_filters output) pushes the scan
    predicate INTO the decode kernel — late materialization: the filter
    columns decode first, the selection mask is evaluated on them, and
    the bulk columns (html/text dominate every block) are decoded only
    when the mask selects anything and emitted only for matching rows.
    A selective filter therefore moves matching rows across the Arrow
    boundary instead of whole buckets, and a bucket with zero matches
    skips bulk decode entirely (block-granular dictionary-scan
    behavior, one level below the manifest's zone pruning).

    `missing` ({bucket: columns that bucket has no block for}, from
    manifest.missing_columns) null-fills schema-evolved columns; a
    column absent WITHOUT a missing-set entry is still a hard error
    (bucket split across partitions / corrupt wave).

    `gen_missing` (manifest.wave_allowance, streamed stores) overrides
    `missing` at GENERATION granularity: the group's gen_key file path
    names its wave, and only columns the wave predates may null-fill —
    a post-evolution generation missing an evolved column raises."""
    from .. import zonemap

    cols = list(schema.keys())
    missing = missing or {}
    grouped = blocks.groupBy("bucket", gen_key) if gen_key \
        else blocks.groupBy("bucket")

    if hasattr(grouped, "applyInArrow"):
        import pyarrow as pa

        from .. import arrowcodecs

        def decode_group_arrow(table: "pa.Table") -> "pa.Table":
            arrowcodecs.pin_worker_threads()
            col_names = table.column("column").to_pylist()
            if len(set(col_names)) != len(col_names):
                raise ValueError(
                    f"duplicate block rows for bucket "
                    f"{table.column('bucket')[0].as_py()}: {sorted(col_names)} "
                    "(stray rows from an uncommitted write, or a bucket that "
                    "spanned partitions during encode_colocated)"
                )
            metas = table.column("meta").to_pylist()
            payloads = table.column("payload")
            idx = {cname: i for i, cname in enumerate(col_names)}
            bucket_id = int(table.column("bucket")[0].as_py())
            if gen_missing is not None and gen_key:
                miss = gen_missing.get(
                    _wave_of(table.column(gen_key)[0].as_py()), set()
                )
            else:
                miss = missing.get(bucket_id, ())
            absent = [c for c in cols if c not in idx and c not in miss]
            stray = [c for c in idx if c not in schema]
            if absent or stray:
                raise ValueError(
                    f"bucket {bucket_id} block set is corrupt: "
                    f"missing columns {absent}, stray columns {stray} "
                    "(split across partitions, or foreign rows in a wave dir)"
                )
            arrays: dict[str, pa.Array] = {}

            def dec(cname: str) -> pa.Array:
                if cname not in arrays:
                    if cname in idx:
                        i = idx[cname]
                        arrays[cname] = arrowcodecs.decode_column_arrow(
                            payloads[i].as_py(), json.loads(metas[i])
                        )
                    else:  # schema-evolved: null-fill at the bucket's
                        # row count (any present block's meta carries n)
                        n = json.loads(metas[next(iter(idx.values()))])["n"]
                        arrays[cname] = pa.nulls(
                            n, type=zonemap.arrow_type(schema[cname])
                        )
                return arrays[cname]

            if norm_filters:
                import pyarrow.compute as pc

                mask = zonemap.arrow_mask(dec, norm_filters)
                nsel = pc.sum(mask).as_py() or 0
                if not nsel:
                    return pa.table(
                        {c: pa.array([], type=zonemap.arrow_type(schema[c]))
                         for c in cols}
                    )
                # selected decode: seg: codecs skip whole segments with
                # no selected row (page skipping); columns the mask
                # already decoded just filter
                sel = mask.to_numpy(zero_copy_only=False)
                out: dict[str, pa.Array] = {}
                for c in cols:
                    if c in arrays:
                        out[c] = arrays[c].filter(mask)
                    elif c in idx:
                        i = idx[c]
                        out[c] = arrowcodecs.decode_column_arrow_selected(
                            payloads[i].as_py(), json.loads(metas[i]), sel
                        )
                    else:  # schema-evolved: null-fill the selected rows
                        out[c] = pa.nulls(
                            nsel, type=zonemap.arrow_type(schema[c])
                        )
                return pa.table(out)
            return pa.table({c: dec(c) for c in cols})

        return grouped.applyInArrow(decode_group_arrow, out_schema)

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["column"].duplicated().any():
            raise ValueError(
                f"duplicate block rows for bucket {pdf['bucket'].iloc[0]}: "
                f"{sorted(pdf['column'])}"
            )
        rows_by_col = {row["column"]: row for _, row in pdf.iterrows()}
        bucket_id = int(pdf["bucket"].iloc[0])
        if gen_missing is not None and gen_key:
            miss = gen_missing.get(_wave_of(pdf[gen_key].iloc[0]), set())
        else:
            miss = missing.get(bucket_id, ())
        absent = [c for c in cols if c not in rows_by_col and c not in miss]
        stray = [c for c in rows_by_col if c not in schema]
        if absent or stray:
            raise ValueError(
                f"bucket {bucket_id} block set is corrupt: "
                f"missing columns {absent}, stray columns {stray} "
                "(split across partitions, or foreign rows in a wave dir)"
            )
        series: dict[str, pd.Series] = {}

        def dec(cname: str) -> pd.Series:
            if cname not in series:
                if cname in rows_by_col:
                    row = rows_by_col[cname]
                    series[cname] = codecs.decode_column(
                        bytes(row["payload"]), json.loads(row["meta"])
                    )
                else:  # schema-evolved: null-fill
                    n = json.loads(next(iter(rows_by_col.values()))["meta"])["n"]
                    series[cname] = pd.Series([None] * n, dtype=object)
            return series[cname]

        if norm_filters:
            mask = zonemap.pandas_mask(dec, norm_filters, schema)
            if not mask.any():
                return pd.DataFrame(columns=cols)
            data = {}
            for c in cols:
                if c in series:  # decoded for the mask: just filter
                    s = series[c][mask].reset_index(drop=True)
                elif c in rows_by_col:  # selected decode (segment skip)
                    row = rows_by_col[c]
                    s = codecs.decode_column_selected(
                        bytes(row["payload"]), json.loads(row["meta"]), mask
                    )
                else:  # schema-evolved: null-fill selected rows
                    s = pd.Series([None] * int(mask.sum()), dtype=object)
                if schema[c] == "binary":
                    s = s.map(lambda v: None if v is None else bytes(v))
                data[c] = s
            return pd.DataFrame(data, columns=cols)
        n = len(dec(cols[0])) if cols else 0
        data = {}
        for c in cols:
            s = dec(c)
            if schema[c] == "binary":
                s = s.map(lambda v: None if v is None else bytes(v))
            data[c] = s.reset_index(drop=True)
        if not n:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(data, columns=cols)

    return grouped.applyInPandas(decode_group, out_schema)


def scan_table(spark: SparkSession, out_dir: str, filters: list[tuple],
               columns: list[str] | None = None,
               version: int | None = None,
               engine: str = "auto") -> DataFrame:
    """Filtered scan over the compressed store with zone-map pruning.

    `filters` is a list of (column, op, value) with op in zonemap.OPS
    (=, <, <=, >, >=, in), ANDed together — the DataFrame-source
    pushdown contract (Spark's own parquet filter API uses the same
    triples). Pruning happens in four layers before any payload is
    decompressed:

      1. DRIVER, zero Spark jobs: the manifest's per-(bucket, column)
         zone bounds (recorded by encode from each block's meta) drop
         every bucket whose bounds exclude a filter. A predicate
         outside the global value range plans an empty LogicalRDD —
         no scan at all.
      2. Wave-dir pruning: surviving buckets select wave dirs via
         wave_buckets (whole directories of a 10^5-bucket snapshot
         never hit the file listing).
      3. Column Bloom sidecars (encode bloom_columns=): an `=`/`in`
         probe on a filtered column drops buckets whose filters prove
         the value absent — the layer zone bounds can't provide on
         high-cardinality equality (still zero Spark jobs).
      4. Parquet row-group stats on the bucket column inside the
         surviving dirs.

    The residual filter is then applied JVM-side on the decoded rows
    (zone bounds are block-granular, and string bounds are truncated,
    so residual evaluation is always required). Columns the filters
    need are decoded even when `columns` projects them out, then
    dropped.

    `engine`: "auto" (default) runs the SHUFFLE-FREE colocated decode —
    block files hold whole buckets, so the kernels run straight off the
    scan with no exchange of payload bytes — falling back to the
    groupBy path only for time-travel reads (`version`), whose wave
    layout the colocated reader does not resolve. "shuffle" /
    "colocated" force a path.

    Zone pruning is clustering-dependent (hash bucketing scatters
    values): it pays on snapshots whose ingestion clusters the filter
    column — see kmers_spark/zonemap.py."""
    from .. import zonemap

    if engine not in ("auto", "shuffle", "colocated"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "colocated" and version is not None:
        raise ValueError("time-travel scans require engine='shuffle' (or 'auto')")
    if version is None:
        # one read pins pruning AND decode to the same snapshot (a
        # commit landing mid-scan must not mix two versions' wave sets)
        m, pin = manifest.load_with_version(out_dir)
    else:
        m, pin = manifest.load(out_dir, version=version), version
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    schema = manifest.ordered_schema(m)
    norm = zonemap.normalize_filters(filters, schema)
    if columns is not None:
        unknown = [c for c in columns if c not in schema]
        if unknown:
            raise KeyError(f"columns not in snapshot schema: {unknown}")
        if not columns:
            raise ValueError("columns projection must not be empty")
        out_cols = [c for c in schema if c in set(columns)]
    else:
        out_cols = list(schema)
    buckets = zonemap.prune_buckets(
        m, norm, blocks=manifest.block_stats(out_dir, m)
    )
    # 4th pruning layer, still zero Spark jobs: column Bloom sidecars
    # (encode bloom_columns=) drop buckets where an equality probe
    # tests definitely-absent — the case zone bounds can't prune
    buckets = bloom_prune_filters(out_dir, m, norm, buckets)
    if not buckets:
        out_schema = ", ".join(f"`{c}` {_SPARK_TYPE[schema[c]]}" for c in out_cols)
        return spark.createDataFrame([], out_schema)
    fcols = {c for c, _op, _bv, _v in norm}
    decode_cols = [c for c in schema if c in set(out_cols) | fcols] \
        if columns is not None else None
    # all committed buckets surviving == unfiltered scan: skip the isin
    # (no pruning value, and a 10^5-literal predicate bloats codegen)
    bsel = None if len(buckets) == len(m.get("committed_buckets", [])) else buckets
    use_colocated = engine == "colocated" or (engine == "auto" and version is None)
    if use_colocated:
        df = decode_colocated(spark, out_dir, columns=decode_cols,
                              filters=filters, buckets=bsel, snapshot=m)
    else:
        # pin = 0 only for legacy single-file manifests (no version chain
        # to pin against — pass None and accept the legacy behavior)
        df = decode_table(spark, out_dir, buckets=bsel, columns=decode_cols,
                          version=pin or None, filters=filters)
    # the kernel already applied the predicate (late materialization);
    # the JVM residual re-asserts it over the surviving rows — near-free
    # (codegen over matches only) and keeps the query's semantics
    # visible to Catalyst for anything stacked on top
    if norm:  # an empty filter list is a plain scan — nothing to assert
        df = df.filter(_filters_expr(norm, schema))
    if columns is not None and set(out_cols) != set(decode_cols or out_cols):
        df = df.select(*out_cols)
    return df


def _filters_expr(norm: list[tuple], schema: dict[str, str]):
    """Residual predicate: one ANDed JVM expression from normalized
    filters (original literal values, cast to the column's type so
    timestamp/ntz literals compare exactly)."""
    import functools

    from pyspark.sql import functions as F

    def lit_for(value, typ: str):
        t = _SPARK_TYPE[typ]
        if typ in ("timestamp", "timestamp_ntz") and isinstance(value, int):
            # epoch-us int (to_bound_space's native form): a plain
            # cast("timestamp") would read it as epoch-SECONDS and the
            # residual filter would silently drop every matching row
            return F.timestamp_micros(F.lit(value)).cast(t)
        if typ in ("timestamp", "timestamp_ntz") and isinstance(value, str):
            value = __import__("datetime").datetime.fromisoformat(value)
        return F.lit(value).cast(t)

    conds = []
    for col, op, _bv, value in norm:
        c = F.col(col)
        typ = schema[col]
        if op == "in":
            lits = [lit_for(v, typ) for v in value]
            conds.append(functools.reduce(
                lambda a, b: a | b, (c == lv for lv in lits)
            ) if lits else F.lit(False))
            continue
        lv = lit_for(value, typ)
        conds.append(
            {"=": c == lv, "<": c < lv, "<=": c <= lv,
             ">": c > lv, ">=": c >= lv}[op]
        )
    return functools.reduce(lambda a, b: a & b, conds)


def _bloom_prune_generic(out_dir: str, m: dict, typ: str,
                         bucket_probes: dict[int, list],
                         reg_sets: dict[str, set[int]],
                         lister) -> set[int]:
    """Candidate buckets surviving a Bloom stage: a bucket is dropped
    only when EVERY wave dir that may hold it has a manifest-registered
    sidecar for it (`reg_sets`: {wave_rel: registered buckets}) and
    every probe value tests definitely-absent in all of them. Any gap —
    pre-bloom snapshot, streamed wave, unregistered wave, missing
    file — keeps the bucket (conservative: Bloom absence may only ever
    ADD decode work). `lister(abs_bloom_dir)` -> {bucket: [paths]} for
    whichever filter family (key or one column) is being probed."""
    import os

    if not reg_sets or "wave_dirs" not in m:
        return set(bucket_probes)
    wb = m.get("wave_buckets", {})
    # hoist: the per-wave bucket lists are up to num_buckets long —
    # materialize their sets once, not per (bucket, wave) iteration
    wb_sets = {d: set(v) for d, v in wb.items()}
    keep: set[int] = set()
    listings: dict[str, dict[int, list[str]]] = {}
    for b, probes in bucket_probes.items():
        if typ == "int64":
            typed = []
            for k in probes:
                try:
                    typed.append(int(k))
                except (TypeError, ValueError):
                    pass  # can't be an int64 value: never present
            if not typed:
                continue  # no parseable probe: bucket can't match
            probes = typed
        maybe = False
        for d in m["wave_dirs"]:
            if d in wb_sets and b not in wb_sets[d]:
                continue  # wave provably doesn't hold this bucket
            if b not in reg_sets.get(d, ()):
                maybe = True  # wave may hold the bucket, no filter
                break
            listing = listings.get(d)
            if listing is None:
                listing = lister(
                    os.path.join(out_dir, d, bloomkern.BLOOM_DIR)
                )
                listings[d] = listing
            paths = listing.get(b)
            if not paths:
                maybe = True  # registered but unreadable: conservative
                break
            payload, bmeta = bloomkern.read_sidecar(paths[0])
            if any(bloomkern.probe(payload, bmeta, k) for k in probes):
                maybe = True
                break
        if maybe:
            keep.add(b)
    return keep


def _bloom_prune(out_dir: str, m: dict, key_col: str,
                 bucket_keys: dict[int, list]) -> set[int]:
    """Key-filter stage of lookup_keys — see _bloom_prune_generic."""
    bb = m.get("bloom_buckets")
    if not bb:
        return set(bucket_keys)
    return _bloom_prune_generic(
        out_dir, m, m["schema"].get(key_col), bucket_keys,
        {d: set(v) for d, v in bb.items()}, bloomkern.list_sidecars,
    )


def bloom_prune_filters(out_dir: str, m: dict, norm: list[tuple],
                        buckets: list[int]) -> list[int]:
    """Column-filter stage of scan_table: for each `=` / `in` predicate
    on a column with registered Bloom sidecars (encode bloom_columns=),
    drop surviving buckets where every probe value tests definitely-
    absent in every wave's filter. This is the pruning layer zone
    bounds can't provide on high-cardinality equality probes (an exact
    URL is inside every bucket's min/max on a hash-bucketed store, but
    in only ~1 bucket's filter). Probes use the normalized BOUND
    values (ints already coerced; strings ride untruncated — only zone
    BOUNDS truncate, filters hash exact values)."""
    bc = m.get("bloom_cols")
    if not bc or not buckets:
        return buckets
    surviving = set(buckets)
    for col, op, bv, _value in norm:
        if op not in ("=", "in") or not surviving:
            continue
        typ = m["schema"].get(col)
        if typ not in ("string", "int64"):
            continue
        if not any(col in (reg or {}) for reg in bc.values()):
            continue  # column never filtered anywhere: skip the listdirs
        probes = [p for p in (bv if op == "in" else [bv]) if p is not None]
        if not probes:
            continue  # NULL never equals anything; leave it to the mask
        if typ == "string" and not all(
            isinstance(p, (str, bytes)) for p in probes
        ):
            # a non-string literal on a string column goes through
            # Spark's cast rules, which the filter can't mirror — keep
            continue
        reg_sets = {d: set((reg or {}).get(col, ()))
                    for d, reg in bc.items()}

        def lister(abs_dir: str, _c: str = col) -> dict[int, list[str]]:
            return bloomkern.list_col_sidecars(abs_dir).get(_c, {})

        surviving = _bloom_prune_generic(
            out_dir, m, typ, {b: probes for b in surviving},
            reg_sets, lister,
        )
    return sorted(surviving)


def lookup_keys(spark: SparkSession, out_dir: str, keys: list[str]) -> DataFrame:
    """Point lookups against the COMPRESSED store: re-derive each key's
    bucket from the manifest (same salted hash the encode job used —
    computed DRIVER-SIDE via the golden-tested xxhash64 mirror, so no
    Spark job runs before the decode itself), prune buckets whose
    recorded key range (Iceberg file-stats analogue, written at commit)
    excludes every probe key that hashes to them, probe the per-bucket
    key Bloom sidecars (kernels/bloom.py) to drop buckets where every
    probe key is definitely absent, decode ONLY the surviving buckets
    (the bucket predicate prunes parquet row groups, test_plans.py),
    and filter to the requested keys. At 10^12 rows this touches at
    most |keys| buckets out of num_buckets — and ZERO buckets for
    absent keys, whether outside the stored ranges (range pruning) or
    inside them (Bloom pruning, up to the ~1% false-positive rate)."""
    from . import partitioning

    m = manifest.load(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    key_col = m["key"]
    hot = m.get("hot_keys") or {}
    ranges = m.get("bucket_key_ranges", {})
    scheme = m.get("bucket_scheme", partitioning.LEGACY_SCHEME)

    def candidates(k: str) -> list[int]:
        """Buckets that could hold key k under the snapshot's scheme."""
        if scheme in (partitioning.BUCKET_SCHEME, partitioning.LEGACY_SCHEME):
            # explicit ALLOWLIST for hash-deriving a single bucket: any
            # scheme this code has never seen must fall to the
            # all-committed-buckets path below — hash-deriving under a
            # zorder/external layout silently reports present keys
            # absent (the key does not determine the bucket there)
            return [partitioning.bucket_for_key(k, m["num_buckets"], hot,
                                                scheme=scheme)]
        if scheme != partitioning.RANGE_SCHEME:
            # external (caller-bucketed sink), zorder (bucket is a
            # function of the cluster columns' z-value), or a future
            # scheme: no key rule is trustworthy — every committed
            # bucket is a candidate and the recorded per-bucket key
            # ranges + Bloom sidecars below do the pruning
            return list(m.get("committed_buckets", []))
        if m.get("cluster_by") == key_col and m["schema"][key_col] == "string":
            # range-bucketed ON the key: exact bucket via the same
            # searchsorted rule encode used (driver-side bisect),
            # including the heavy-value overflow salt — with
            # cluster == key the salt input is the probe itself
            return [partitioning.range_bucket_for_key(
                k, m["range_boundaries"], "string"
            )]
        # range-bucketed on a DIFFERENT column: the key hash says nothing
        # about placement — every committed bucket is a candidate, and the
        # per-bucket key ranges below do the pruning (blocks are key-
        # sorted, so the recorded [key_min, key_max] stays exact)
        return list(m.get("committed_buckets", []))

    def may_hold(rng, k: str) -> bool:
        """Can the recorded [key_min, key_max] contain probe k? Probes
        arrive as strings; int64-key snapshots record INT ranges, so the
        probe is parsed for the compare (a non-numeric probe against an
        int range proves absence). Unknown/mixed shapes keep the
        bucket."""
        if rng is None:
            return True
        lo, hi = rng
        if isinstance(lo, str) and isinstance(hi, str):
            return lo <= k <= hi
        if isinstance(lo, int) and isinstance(hi, int):
            try:
                return lo <= int(k) <= hi
            except ValueError:
                return False  # can't be an int64 key at all
        return True

    bucket_keys: dict[int, list[str]] = {}
    for k in keys:
        for b in candidates(k):
            if may_hold(ranges.get(str(b)), k):
                bucket_keys.setdefault(int(b), []).append(k)
    # key Bloom sidecars (kernels/bloom.py): drop every candidate
    # bucket whose covering waves all carry a filter and every probe
    # key tests definitely-absent — an absent key INSIDE a bucket's
    # key range then costs a ~KB driver read instead of a bucket decode
    buckets = _bloom_prune(out_dir, m, key_col, bucket_keys)
    out_schema = ", ".join(
        f"`{c}` {_SPARK_TYPE[t]}" for c, t in manifest.ordered_schema(m).items()
    )
    if not buckets:
        return spark.createDataFrame([], out_schema)
    from pyspark.sql import functions as F

    # the key predicate also rides INTO the decode kernel (late
    # materialization): only probe-key rows cross the Arrow boundary,
    # and segmented bulk columns decompress only matching segments
    try:
        # shuffle-free: the surviving buckets' wave files decode in
        # place (no exchange of payload bytes for a point lookup)
        decoded = decode_colocated(
            spark, out_dir, buckets=sorted(buckets),
            filters=[(key_col, "in", list(keys))] if keys else None,
        )
    except (ValueError, TypeError):
        # probe literals that don't parse as the key's type (e.g. a
        # non-numeric probe against an int64 key) can't match anyway;
        # decode the buckets and let the join return empty
        decoded = decode_colocated(spark, out_dir, buckets=sorted(buckets))
    # join string-vs-string: an implicit probe->BIGINT cast (ANSI) would
    # CRASH the whole lookup on one malformed probe key
    kdf = spark.createDataFrame([(k,) for k in keys], "`__probe` string")
    return decoded.join(
        F.broadcast(kdf),
        decoded[key_col].cast("string") == kdf["__probe"], "inner"
    ).drop("__probe")


def decode_colocated(spark: SparkSession, out_dir: str,
                     columns: list[str] | None = None,
                     filters: list[tuple] | None = None,
                     buckets: list[int] | None = None,
                     snapshot: dict | None = None) -> DataFrame:
    """Shuffle-free decode: block files are written bucket-grouped, so a
    mapInArrow pass can reassemble each bucket's columns without moving
    payloads (the groupBy in decode_table re-shuffles ~enc_bytes; this
    path only requires that a bucket's block rows share a scan partition,
    which the encode write layout guarantees via one-file-per-task).
    """
    import pyarrow as pa

    from .. import arrowcodecs

    m = snapshot if snapshot is not None else manifest.load(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    full = manifest.ordered_schema(m)
    if columns is not None:
        if not columns:
            raise ValueError("columns projection must not be empty")
        unknown = [c for c in columns if c not in full]
        if unknown:
            raise KeyError(f"columns not in snapshot schema: {unknown}")
        schema = {c: t for c, t in full.items() if c in set(columns)}
    else:
        schema = full
    assert_utc_session(spark, schema)
    cols = list(schema.keys())
    missing = (
        manifest.missing_columns(
            # bucket-restricted reads also restrict the spilled stats
            # files opened (wave-level pruning; a point lookup on an
            # evolved 10^5-bucket snapshot opens ~1 file, not all)
            m, cols, blocks=manifest.block_stats(out_dir, m, buckets=buckets)
        )
        if m.get("evolved")  # never-evolved: skip the stats read entirely
        else {}
    )
    dec_schema = dict(schema)
    anchor = None
    if missing and columns is not None:
        key = m.get("key")
        if key in full and key not in dec_schema and any(
            miss >= set(cols) for miss in missing.values()
        ):
            anchor = key
            dec_schema[key] = full[key]
    out_schema = ", ".join(f"`{c}` {_SPARK_TYPE[t]}" for c, t in dec_schema.items())
    dec_cols = list(dec_schema.keys())
    norm = None
    if filters:
        from .. import zonemap

        norm = zonemap.normalize_filters(filters, schema)

    # Whole files per scan partition so buckets never split: the default
    # spark.sql.files.maxPartitionBytes (128MB) would split a large block
    # file at row-group boundaries and scatter a bucket's rows. Session
    # confs are session-scoped, so plan the read on an isolated newSession
    # (same SparkContext) with both split knobs pushed to 1 TiB — each
    # block file (one writer task = whole buckets) becomes one partition.
    s2 = spark.newSession()
    for conf in ("spark.sql.session.timeZone",
                 "spark.sql.execution.arrow.maxRecordsPerBatch"):
        try:
            s2.conf.set(conf, spark.conf.get(conf))
        except Exception:
            pass
    s2.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))
    s2.conf.set("spark.sql.files.openCostInBytes", str(1 << 40))
    # wave-dir pruning for bucket-filtered reads, same as decode_table
    paths = committed_wave_paths(out_dir, m, buckets=buckets)
    if not paths:  # manifest exists but nothing committed yet
        df = spark.createDataFrame([], out_schema)
        return df.select(*cols) if anchor else df
    blocks = s2.read.parquet(*paths)
    if buckets is not None:
        blocks = blocks.filter(blocks.bucket.isin(buckets))
    if columns is not None and len(dec_schema) < len(full):
        # projection below the scan: unwanted payloads never decompress
        blocks = blocks.filter(blocks.column.isin(dec_cols))
    gen_missing = manifest.wave_allowance(m, cols) if m.get("streamed") else None
    if gen_missing is not None:
        # file provenance for the kernel: which WAVE each block row came
        # from, so the evolution allowance applies per generation (a
        # post-evolution generation missing an evolved column raises).
        # A projection, not a shuffle — the plan stays exchange-free.
        from pyspark.sql import functions as F

        blocks = blocks.withColumn("_gen", F.input_file_name())

    def decode_partition(batches):
        arrowcodecs.pin_worker_threads()
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        table = pa.concat_tables(tables).combine_chunks()
        buckets = table.column("bucket").to_pylist()
        col_names = table.column("column").to_pylist()
        metas = table.column("meta").to_pylist()
        payloads = table.column("payload")
        gens = (
            [_wave_of(p) for p in table.column("_gen").to_pylist()]
            if gen_missing is not None else None
        )
        per_bucket: dict[tuple, dict] = {}
        for i, b in enumerate(buckets):
            k = (b, gens[i]) if gens is not None else (b, None)
            cols_of_b = per_bucket.setdefault(k, {})
            if col_names[i] in cols_of_b:
                raise ValueError(
                    f"duplicate block rows for bucket {b}: column "
                    f"{col_names[i]!r} appears twice (corrupt wave dir)"
                )
            cols_of_b[col_names[i]] = i
        for (b, gen), idx in per_bucket.items():
            miss = gen_missing.get(gen, set()) if gens is not None \
                else missing.get(int(b), ())
            absent = [c for c in dec_cols if c not in idx and c not in miss]
            stray = [c for c in idx if c not in full] if columns is None \
                else [c for c in idx if c not in dec_schema]
            if absent or stray:
                raise ValueError(
                    f"bucket {b} block set is corrupt: missing columns "
                    f"{absent}, stray columns {stray} (split across "
                    "partitions, or foreign rows in a wave dir)"
                )
            arrays: dict = {}

            def dec(cname, _idx=idx):
                if cname not in arrays:
                    if cname in _idx:
                        arrays[cname] = arrowcodecs.decode_column_arrow(
                            payloads[_idx[cname]].as_py(),
                            json.loads(metas[_idx[cname]]),
                        )
                    else:  # schema-evolved column: null-fill
                        from .. import zonemap

                        n = json.loads(metas[next(iter(_idx.values()))])["n"]
                        arrays[cname] = pa.nulls(
                            n, type=zonemap.arrow_type(dec_schema[cname])
                        )
                return arrays[cname]

            if norm:
                from .. import zonemap
                import pyarrow.compute as pc

                mask = zonemap.arrow_mask(dec, norm)
                nsel = pc.sum(mask).as_py() or 0
                if not nsel:
                    continue  # zero matches: bulk columns never decode
                sel = mask.to_numpy(zero_copy_only=False)
                built: dict = {}
                for c in dec_cols:
                    if c in arrays:
                        built[c] = arrays[c].filter(mask)
                    elif c in idx:
                        built[c] = arrowcodecs.decode_column_arrow_selected(
                            payloads[idx[c]].as_py(),
                            json.loads(metas[idx[c]]), sel,
                        )
                    else:
                        built[c] = pa.nulls(nsel, type=zonemap.arrow_type(dec_schema[c]))
                out = pa.table(built)
            else:
                out = pa.table({c: dec(c) for c in dec_cols})
            for batch in out.to_batches():
                yield batch

    df = blocks.mapInArrow(decode_partition, out_schema)
    return df.select(*cols) if anchor else df

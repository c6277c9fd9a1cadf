"""The reference's declarative field-config operators (SURVEY.md §2.B) as
DataFrame transforms. Each implements the *intended* semantics of the
cited JS (latent defects listed in SURVEY.md's appendix are fixed, e.g.
unwrap's first-element-only early return).

The reference compiles its config to closures applied per item in a JS
loop (``lib/ROCrateIndexer.js:27-76, 317-342``); here the same config
compiles to Column expressions / join fragments, so Catalyst pushes the
filters down and the resolve joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- B3/B4: predicate compilation (makeEq / compileFilter,
#     lib/ROCrateIndexer.js:120-186) ------------------------------------

def compile_condition(field: str, cond, root_id: str | None = None) -> Column:
    """One field condition: bare string = exact match; {"re": pat} =
    regex; {"is_root": True} = the item is the root dataset. Array-typed
    fields match if ANY element matches (reference array-any semantics).
    """
    col = F.col(field)
    if isinstance(cond, dict) and cond.get("is_root"):
        return F.col("id") == F.lit(root_id)
    if isinstance(cond, dict) and "re" in cond:
        pat = cond["re"]
        test = lambda c: c.rlike(pat)  # noqa: E731
    else:
        test = lambda c: c == F.lit(str(cond))  # noqa: E731
    # arrays: any-element match (reference array-any semantics); the
    # branch is a Python-time decision — Spark resolves types statically
    if field == "types":
        return F.exists(col, test)
    return test(col)


def compile_filter(spec: dict, root_id: str | None = None) -> Column:
    """AND of per-field conditions (compileFilter,
    lib/ROCrateIndexer.js:120-154)."""
    pred = F.lit(True)
    for field, cond in spec.items():
        pred = pred & compile_condition(field, cond, root_id)
    return pred


def filter_items(items: DataFrame, spec: dict, root_id: str | None = None) -> DataFrame:
    return items.where(compile_filter(spec, root_id))


# --- B2: type dispatch (indexItems, lib/ROCrateIndexer.js:317-342) ------

def type_dispatch(items: DataFrame, type_filters: dict[str, dict]) -> DataFrame:
    """First matching configured @type wins (the reference truncates
    types=[type]); an item whose winning type's filter rejects it is
    dropped (not re-dispatched to a later type). Output adds
    ``record_type_s`` (B6 base projection's type column).

    ONE scan of items: the winner is a ``when``-chain projection and the
    per-type filters compose into a single disjunctive predicate — the
    per-type union-of-branches form re-scanned items once per configured
    type (r3 VERDICT nit #2), which at a many-type config multiplies the
    100 TB corpus read."""
    rec = None
    for typ in type_filters:
        hit = F.array_contains(F.col("types"), typ)
        rec = F.when(hit, F.lit(typ)) if rec is None else rec.when(hit, F.lit(typ))
    out = items.withColumn("record_type_s", rec)
    keep = F.lit(False)
    for typ, spec in type_filters.items():
        keep = keep | (
            (F.col("record_type_s") == typ) & compile_filter(spec or {})
        )
    return out.where(keep)


# --- B6: base projection (baseSolr/map_all, lib/ROCrateIndexer.js:826-834)

def map_all(items: DataFrame) -> DataFrame:
    return items.select(
        F.col("id"),
        F.col("id").alias("id_orig"),
        F.element_at(F.col("types"), 1).alias("record_type_s"),
        F.element_at(F.col("types"), 1).alias("type_label"),
        "name",
        "description",
    )


# --- B11: resolve (1-hop deref, lib/ROCrateIndexer.js:554-635) -----------

def resolve(
    items: DataFrame,
    edges: DataFrame,
    prop: str,
    index_as: str,
    display: str = "name",
    broadcast: bool | None = None,
) -> DataFrame:
    """Follow ``prop`` links from each item to the target item, emitting
    the display field and the ``{index_as}_id`` side output
    (lib/ROCrateIndexer.js:460-468).

    ``broadcast``: True forces a broadcast of the target side, False
    forbids it, None (default) lets Catalyst/AQE decide from size stats —
    an unconditional ``F.broadcast`` would OOM when ``items`` is itself
    corpus-sized (every-file-an-entity crates at 10^12 scale)."""
    e = edges.where(F.col("property") == prop)
    tgt = items.select(
        F.col("id").alias("_tid"), F.col(display).alias(index_as)
    )
    if broadcast is True:
        tgt = F.broadcast(tgt)
    j2 = (
        items.alias("i")
        .join(e.alias("e"), F.col("i.id") == F.col("e.src"))
        .join(tgt, F.col("e.dst") == F.col("_tid"))
    )
    if broadcast is False:
        j2 = j2.hint("shuffle_hash")
    return j2.select(
        F.col("i.id").alias("id"),
        F.col(index_as),
        F.col("e.dst").alias(f"{index_as}_id"),
    )


def resolve_json(
    items: DataFrame,
    edges: DataFrame,
    prop: str,
    index_as: str,
    display: str = "name",
    search: str = "id",
    broadcast: bool | None = None,
) -> DataFrame:
    """B11's JSON-facet form: each resolved target serialized as the
    reference's ``{"@id": id, "display": t[display], "search":
    t[search]}`` string (``lib/ROCrateIndexer.js:612-617``; golden shape
    ``test/ro-crate.spec.js:132-167`` — the portal's JSON-flagged facets
    parse these back to id + display). Key order matches
    ``JSON.stringify`` insertion order so oracles compare byte-equal.

    ``broadcast`` follows :func:`resolve`'s contract: None (default) lets
    AQE decide from runtime size stats — the target side is derived from
    ``items`` itself, so forcing a broadcast would OOM the driver on
    corpus-sized item tables."""
    e = edges.where(F.col("property") == prop)
    tgt = items.select(
        F.col("id").alias("_tid"),
        F.to_json(
            F.struct(
                F.col("id").alias("@id"),
                F.col(display).alias("display"),
                F.col(search).alias("search"),
            )
        ).alias(index_as),
    )
    if broadcast is True:
        tgt = F.broadcast(tgt)
    j2 = (
        items.alias("i")
        .join(e.alias("e"), F.col("i.id") == F.col("e.src"))
        .join(tgt, F.col("e.dst") == F.col("_tid"))
    )
    if broadcast is False:
        j2 = j2.hint("shuffle_hash")
    return j2.select(F.col("i.id").alias("id"), F.col(index_as))


# --- B12: resolve via (multi-hop chains, lib/ROCrateIndexer.js:574-595) --

def resolve_via(
    items: DataFrame,
    edges: DataFrame,
    via: list,
    index_as: str,
    display: str = "name",
    store_subgraph: bool = False,
    broadcast: bool | None = None,
) -> DataFrame:
    """Traverse a property chain (e.g. conviction → location), fanning
    out at each hop — one equi-join per hop on the edges table.

    ``via`` entries are property names or dicts with the reference's hop
    options (``doc/Solr_config.md:280-291``): ``{"property": p,
    "includes": spec}`` only follows hop targets matching the B3/B4
    filter spec; ``{"property": p, "reverse": True}`` follows the hop
    AGAINST edge direction (the first hop of a ``cf['@reverse']`` block,
    ``lib/ROCrateIndexer.js:359-367`` + the criminals config's
    reverseSentence chain, ``test-data/criminals/indexer.json:73-83``).
    ``store_subgraph=True`` (the reference's experimental
    context-indexing option, ``doc/Solr_config.md:276-278``) emits EVERY
    item passed through, with a ``hop`` column, instead of terminals
    only; output is then (id, {index_as}, {index_as}_id, hop).

    ``broadcast`` follows :func:`resolve`'s contract: the display-lookup
    side is projected from ``items`` itself, so the default (None) leaves
    the strategy to AQE's size stats rather than forcing a broadcast that
    would OOM on corpus-sized item tables."""
    norm = [{"property": v} if isinstance(v, str) else v for v in via]
    cur = items.select(F.col("id").alias("src0"))
    prev = "src0"
    hop_cols: list[str] = []
    for i, hop in enumerate(norm):
        src_col, dst_col = ("dst", "src") if hop.get("reverse") else ("src", "dst")
        e = edges.where(F.col("property") == hop["property"]).select(
            F.col(src_col).alias(f"_s{i}"), F.col(dst_col).alias(f"_d{i}")
        )
        cur = cur.join(e, F.col(prev) == F.col(f"_s{i}"))
        if "includes" in hop:
            inc = filter_items(items, hop["includes"]).select(
                F.col("id").alias(f"_inc{i}")
            )
            cur = cur.join(inc, F.col(f"_d{i}") == F.col(f"_inc{i}"), "left_semi")
        prev = f"_d{i}"
        hop_cols.append(prev)
    tgt = items.select(F.col("id").alias("_tid"), F.col(display).alias(index_as))
    if broadcast is True:
        tgt = F.broadcast(tgt)
    if not store_subgraph:
        j = cur.join(tgt, F.col(prev) == F.col("_tid"))
        if broadcast is False:
            j = j.hint("shuffle_hash")
        return j.select(
            F.col("src0").alias("id"),
            F.col(index_as),
            F.col(prev).alias(f"{index_as}_id"),
        )
    out = None
    for hop_i, c in enumerate(hop_cols, start=1):
        part = (
            cur.select("src0", F.col(c).alias("_hop_id"))
            .distinct()
            .join(tgt, F.col("_hop_id") == F.col("_tid"))
            .select(
                F.col("src0").alias("id"),
                F.col(index_as),
                F.col("_hop_id").alias(f"{index_as}_id"),
                F.lit(hop_i).alias("hop"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


# --- B10: match-partitioned multi-index (lib/ROCrateIndexer.js:398-414,
#     513-536; doc/Solr_config.md §match; test/ro-crate.spec.js:64-94) ----

def match_multi(
    items: DataFrame,
    edges: DataFrame,
    prop: str,
    clauses: list[dict],
    display: str = "name",
) -> DataFrame:
    """Array-of-clauses field config: each referenced value of ``prop``
    is tested against every clause's ``match`` filter (same spec language
    as B3) and indexed under that clause's ``index_as`` — the reference's
    FOR/SEO split of ``about``. A value matching multiple clauses indexes
    once per clause (``lib/ROCrateIndexer.js:392-396``: "indexed more
    than once ... a feature"); a value matching none is dropped.

    One scan: the clause array becomes a literal array<struct> column,
    filtered per row and exploded — no per-clause union, no re-scan.
    Output: (id, index_as, value, value_id).
    """
    e = edges.where(F.col("property") == prop).select(
        F.col("src").alias("_src"), F.col("dst").alias("_dst")
    )
    joined = e.join(items, F.col("_dst") == F.col("id"))
    cl = F.array(
        *[
            F.struct(
                F.lit(c["index_as"]).alias("index_as"),
                compile_filter(c["match"]).alias("m"),
            )
            for c in clauses
        ]
    )
    hits = F.filter(cl, lambda x: x["m"])
    return (
        joined.select(
            F.col("_src").alias("id"),
            F.col(display).alias("value"),
            F.col("id").alias("value_id"),
            F.explode(hits).alias("c"),
        )
        .select("id", F.col("c.index_as").alias("index_as"), "value", "value_id")
    )


# --- B14: recursive fixpoint indexing (lib/ROCrateIndexer.js:247-248,
#     305-312, enqueue :620-630) ------------------------------------------

def resolve_fixpoint(
    items: DataFrame,
    edges: DataFrame,
    seed_ids: DataFrame,
    properties: list[str] | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Transitive closure of resolved items: starting from ``seed_ids``
    (a 1-column ``id`` frame), repeatedly follow edges (optionally only
    the configured resolve ``properties``) and index every reachable item
    exactly once — the reference's *intended* fixed-point loop (its
    ``resolvedItemsToIndex`` queue is latently dead in v1.2.0, see
    SURVEY.md appendix; we implement the documented semantics: resolved
    targets indexed in later passes, bypassing type filters, dedup by id).

    Output: (id, depth) — depth 0 for seeds, k for items first reached at
    hop k. Spark shape: a driver-bounded loop of equi-join + anti-join;
    each iteration shuffles only the FRONTIER (new ids), not the closure,
    so the work is O(edges-touched), Semi-naive Datalog style. The depth
    bound (default 20) caps pathological cycles; convergence (empty
    frontier) exits early — entity graphs are shallow.

    Semantics (matched exactly by the recursive-CTE oracle): only ids
    that exist as items are indexed OR traversed through — a dangling
    @id resolves to nothing and its outgoing edges (if any) are not
    followed; non-item seed ids are dropped, not emitted at depth 0."""
    e = edges
    if properties is not None:
        e = e.where(F.col("property").isin(properties))
    e = e.select(F.col("src").alias("_src"), F.col("dst").alias("_dst"))
    seen = (
        seed_ids.select("id")
        .distinct()
        .join(items.select("id"), "id", "left_semi")
        .withColumn("depth", F.lit(0))
    )
    frontier = seen.select("id")
    for depth in range(1, max_iters + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["_src"])
            .select(F.col("_dst").alias("id"))
            .distinct()
            .join(seen.select("id"), "id", "left_anti")
            # closure stays bounded by the entity graph: keep only ids
            # that ARE items (dangling @ids resolve to nothing)
            .join(items.select("id"), "id", "left_semi")
        )
        nxt = nxt.localCheckpoint()  # cut the growing lineage each hop
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt.withColumn("depth", F.lit(depth)))
        frontier = nxt
    return seen


# --- B15: @reverse (lib/ROCrateIndexer.js:359-367) -----------------------

def resolve_reverse(
    items: DataFrame, edges: DataFrame, prop: str, index_as: str, display: str = "name"
) -> DataFrame:
    """Same join with edge direction flipped (dst → src)."""
    flipped = edges.select(
        F.col("dst").alias("src"), F.col("property"), F.col("src").alias("dst")
    )
    return resolve(items, flipped, prop, index_as, display)


# --- B16: inherit (lib/ROCrateIndexer.js:374-385) ------------------------

def inherit(
    items: DataFrame,
    field: str,
    root_id: str,
    root_source: DataFrame | None = None,
) -> DataFrame:
    """Items lacking ``field`` copy it from the root item (one level,
    straight to root) — broadcast 1-row aggregate + coalesce.

    ``root_source`` is where the root item is looked up; it defaults to
    ``items`` but MUST be the unfiltered item table when ``items`` is a
    type-filtered slice — the reference's canonical use is Person.license
    inheriting from the root Dataset (``lib/ROCrateIndexer.js:374-385``),
    and the root is almost never of the dispatched type.

    The root lookup is collapsed to EXACTLY one row via max() (max of one
    value, or NULL when the root id is absent) so a missing root degrades
    to "no inheritance" — the same semantics as the oracle's scalar
    subquery — instead of a 0-row crossJoin dropping every item."""
    src = items if root_source is None else root_source
    root_val = (
        src.where(F.col("id") == root_id)
        .agg(F.max(F.col(field)).alias("_root_val"))
    )
    return (
        items.crossJoin(F.broadcast(root_val))
        .withColumn(field, F.coalesce(F.col(field), F.col("_root_val")))
        .drop("_root_val")
    )


# --- geo: lat/lon from geo links + geofilt (convertSearch 'lat,lon',
#     lib/ROCrateIndexer.js:718-726; doc/Solr_config.md:248-253;
#     test/solr-geo.spec.js). The reference's convertSearch has a JS
#     comma-operator bug (returns longitude only); we implement the
#     documented intent: a 'lat,lon' spatial value. -----------------------

def resolve_geo(items: DataFrame, edges: DataFrame, prop: str = "geo") -> DataFrame:
    """Parse each item's geo link ``#lat,lon`` @id into numeric
    coordinates: (id, latitude, longitude, latlon)."""
    e = edges.where(F.col("property") == prop)
    coords = F.regexp_extract(F.col("dst"), r"^#(-?[0-9.]+),(-?[0-9.]+)$", 0)
    lat = F.regexp_extract(F.col("dst"), r"^#(-?[0-9.]+),(-?[0-9.]+)$", 1).cast("double")
    lon = F.regexp_extract(F.col("dst"), r"^#(-?[0-9.]+),(-?[0-9.]+)$", 2).cast("double")
    return (
        items.alias("i")
        .join(e, F.col("i.id") == F.col("src"))
        .where(coords != "")
        .select(
            F.col("i.id").alias("id"),
            lat.alias("latitude"),
            lon.alias("longitude"),
            F.concat_ws(",", lat.cast("string"), lon.cast("string")).alias("latlon"),
        )
    )


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance (km), the Solr ``{!geofilt}`` metric."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


def geofilt(
    geo: DataFrame, lat: float, lon: float, d_km: float
) -> DataFrame:
    """Solr ``{!geofilt pt=lat,lon d=km}``: keep items within d_km of the
    point, with the rounded distance attached."""
    dist = haversine_km(
        F.lit(float(lat)), F.lit(float(lon)), F.col("latitude"), F.col("longitude")
    )
    return (
        geo.withColumn("dist_km", F.round(dist, 6))
        .where(F.col("dist_km") <= d_km)
    )


# --- B17: license normalization (lib/ROCrateIndexer.js:196-232) ----------

def map_license(
    items: DataFrame,
    rules: list[tuple[str, str]],
    default: str,
    field: str = "license",
) -> DataFrame:
    """Map raw license values through regex rules → canonical label,
    first matching rule wins, missing/unmatched → default; original kept
    as ``licenseOriginal`` (root special-case, ROCrateIndexer.js:284-285).
    """
    expr = None
    for pat, label in rules:
        cond = F.col(field).rlike(pat)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    mapped = (expr.otherwise(F.lit(default)) if expr is not None else F.lit(default))
    mapped = F.when(F.col(field).isNull(), F.lit(default)).otherwise(mapped)
    return items.withColumn("licenseOriginal", F.col(field)).withColumn(field, mapped)


# --- B18/B19: validate (lib/ROCrateIndexer.js:768-798) -------------------

def validate_date(col: Column | str) -> Column:
    """Extract YYYY-MM-DD, else empty string (the reference strips
    non-[\\d-] then extracts; regexp_extract subsumes both)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.regexp_extract(c, r"(\d{4}-\d{2}-\d{2})", 1), F.lit(""))


def validate_re(col: Column | str, pattern: str) -> Column:
    """First capture of a config regex over the value (validate_re)."""
    c = F.col(col) if isinstance(col, str) else col
    if "(" not in pattern:
        pattern = f"({pattern})"
    return F.coalesce(F.regexp_extract(c, pattern, 1), F.lit(""))


# --- B20: facet tokenize (makeFacet, lib/ROCrateIndexer.js:732-764) ------

def facet_tokenize(col: Column | str, delim: str = ",") -> Column:
    """The documented ``facet: {tokenize: {delim}}`` form (the reference's
    bare-string form is a defect, SURVEY.md appendix): split + trim,
    drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, delim), lambda x: F.trim(x)),
        lambda x: x != "",
    )


# --- B21: named-identifier rewrite (oni-indexer.js:523-536,
#     lib/ROCrateIndexer.js:269-283) --------------------------------------

def uri_id(
    items: DataFrame,
    namespace: str,
    named_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """Rewrite the record id to the repo-namespace identifier when a named
    identifier exists, else fall back to the md5 hash of the original id
    (the reference's ``hash_path`` fallback, ``oni-indexer.js:455``)."""
    named = F.concat(F.lit(namespace.rstrip("/") + "/"), F.col(named_col))
    return items.withColumn(
        "uri_id",
        F.when(F.col(named_col).isNotNull(), named).otherwise(F.md5(F.col(id_col))),
    )


# --- B13: single-arity resolve (lib/ROCrateIndexer.js:560-570) -----------

def resolve_single(
    items: DataFrame, edges: DataFrame, prop: str, index_as: str, display: str = "name"
) -> DataFrame:
    """``multi: false`` semantics: keep only the first resolved target
    per item (min target id — deterministic; the reference warns and
    takes element 0)."""
    multi = resolve(items, edges, prop, index_as, display)
    from pyspark.sql import Window as W

    w = W.partitionBy("id").orderBy(F.col(f"{index_as}_id").asc())
    return (
        multi.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- C7: copyfield (oni-indexer.js:272-288, schema.json:92-118) ----------

def year_published(col: Column | str) -> Column:
    """``*_datePublished`` → first 4 chars → yearPublished copyfield."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 4)

"""URL canonicalization + host tooling for crawl curation.

Common-Crawl pipelines (CCNet, RefinedWeb, Dolma) dedup and filter on a
CANONICAL url before anything touches the payload: scheme/host case,
default ports, fragments, and tracking parameters are presentation noise
that splits one logical page into many crawl keys. Everything here is
pure Catalyst (regexp/translate at scan speed, no UDF), and every rule is
expressible in ANSI-ish regex SQL so the DuckDB contract can mirror it
bit-for-bit.

Regex dialect note: rules avoid lookarounds (DuckDB's RE2 has none) and
backreference syntax differences stay inside each engine's own dialect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never identify content (click/campaign tracking).
TRACKING_PARAMS = r"(?:utm_[A-Za-z]+|fbclid|gclid|msclkid)"

#: Two-label public suffixes common in web corpora; a third label is the
#: registrable domain under these. (Heuristic subset of the PSL — the full
#: list is data, not code, and would ship as a broadcast table.)
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.br", "net.br", "org.br", "gov.br",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.in", "co.za", "com.mx", "com.cn", "com.ar",
]

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def host_of(url: Column | str) -> Column:
    """Lowercased host (authority minus userinfo and port)."""
    h = F.regexp_extract(url, _SCHEME + r"(?:[^@/?#]*@)?([^:/?#]*)", 1)
    return F.lower(h)


def registered_domain(host: Column) -> Column:
    """Registrable domain by the last-two-labels heuristic, extended to
    three labels for the configured two-label public suffixes."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: when() does NOT short-circuit vectorized evaluation,
    # so a plain element_at(-2) would throw under Spark 4 ANSI mode for
    # single-label hosts even though the n <= 2 branch wins there.
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    last3 = F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2)
    return (
        F.when(n <= 2, host)
        .when(last2.isin(SECOND_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_stats(
    docs,
    *,
    url_col: str = "url",
    text_col: str = "text",
):
    """Per-registrable-domain corpus statistics: (domain, n_docs,
    n_tokens) — the aggregation behind RefinedWeb/Dolma-style domain-level
    filtering decisions (kill list, share caps, per-domain quality).

    Scale: one hash aggregate keyed on the derived domain, map-side
    combined; the few mega-domains that dominate a crawl are exactly the
    skewed keys AQE's skew handling splits."""
    dom = registered_domain(host_of(F.col(url_col)))
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return docs.groupBy(dom.alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(ws_tokens.cast("long")).alias("n_tokens"),
    )


def domain_cap(
    docs,
    *,
    max_docs: int,
    url_col: str = "url",
    order_col: str = "doc_id",
    prefilter: bool = True,
    n_salts: int = 32,
):
    """Keep at most ``max_docs`` documents per registrable domain (a
    standard crawl-balance step: no single domain may dominate the
    training mix), deterministically — lowest ``order_col`` wins.

    ``prefilter=False`` (opt-out, tiny inputs only): one window keyed
    on domain — a mega-domain lands on ONE task with its full row
    count, which is exactly the skew this operator exists to survive,
    so it is not the default.

    ``prefilter=True`` (the DEFAULT — the mega-domain path): two-phase. Phase 1 is a map-side-combined
    count per domain; the over-cap domain set (tiny — only domains with
    > max_docs docs) is broadcast. Under-cap rows pass through with NO
    shuffle (broadcast anti-join). Over-cap rows take a salted two-level
    top-k: per (domain, salt-bucket) window keeps its lowest max_docs
    (bounded partitions), then the final per-domain window ranks at most
    n_salts * max_docs survivors — a mega-domain never lands on one task
    with its full row count. Exact same output either way."""
    from pyspark.sql import Window

    dom = registered_domain(host_of(F.col(url_col)))
    if not prefilter:
        w = Window.partitionBy("__domain").orderBy(order_col)
        return (
            docs.withColumn("__domain", dom)
            .withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= max_docs)
            .drop("__domain", "__rank")
        )

    with_dom = docs.withColumn("__domain", dom)
    over = (
        with_dom.groupBy("__domain")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") > max_docs)
        .select("__domain")
    )
    under = with_dom.join(F.broadcast(over), "__domain", "left_anti").drop("__domain")
    over_rows = with_dom.join(F.broadcast(over), "__domain", "left_semi").withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(order_col).cast("string")), F.lit(n_salts))
    )
    w1 = Window.partitionBy("__domain", "__salt").orderBy(order_col)
    partial = (
        over_rows.withColumn("__rank", F.row_number().over(w1))
        .where(F.col("__rank") <= max_docs)
        .drop("__salt", "__rank")
    )
    w2 = Window.partitionBy("__domain").orderBy(order_col)
    kept = (
        partial.withColumn("__rank", F.row_number().over(w2))
        .where(F.col("__rank") <= max_docs)
        .drop("__domain", "__rank")
    )
    return under.unionByName(kept)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical crawl key. Rules, in order (each a single global regex):

    1. strip the fragment (``#...``);
    2. lowercase scheme and authority (path/query case is significant);
    3. drop the scheme's default port (``:80`` http, ``:443`` https);
    4. remove tracking query params (`TRACKING_PARAMS`), then collapse the
       separator debris (``?&`` → ``?``, trailing ``?``/``&`` dropped);
    5. drop a single trailing slash unless the path is exactly ``/``.

    Urls without a scheme pass through unchanged (crawl noise stays
    byte-stable rather than half-normalized)."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, _SCHEME + r"([^/?#]*)", 1))
    rest = F.regexp_replace(u, _SCHEME + r"[^/?#]*", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    rest = F.regexp_replace(rest, r"([?&])" + TRACKING_PARAMS + r"=[^&]*", r"$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"([^/])/$", r"$1")
    return F.when(
        scheme == "", F.col(url) if isinstance(url, str) else url
    ).otherwise(F.concat(scheme, F.lit("://"), auth, rest))


def blocklist_filter(
    docs,
    blocked,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
):
    """Drop documents whose registrable domain appears on a blocklist
    (UT1/adult-list-style domain filtering, standard in CCNet/RefinedWeb
    pre-processing). Subdomains are covered for free: the join key is the
    REGISTRABLE domain of the doc's host, so an entry "site1.co.uk" kills
    "www.site1.co.uk" and "cdn.a.site1.co.uk" alike.

    Scale: broadcast left-anti equi-join — blocklists are a few million
    rows at most, so the corpus is never shuffled; the domain derivation
    is pure codegen at scan speed."""
    dom = registered_domain(host_of(F.col(url_col)))
    key = F.col(domain_col).alias("__blocked_dom")
    return (
        docs.withColumn("__blocked_dom", dom)
        .join(F.broadcast(blocked.select(key)), "__blocked_dom", "left_anti")
        .drop("__blocked_dom")
    )


def latest_capture(
    df,
    *,
    key_col: str = "url",
    ts_col: str = "warc_us",
    tiebreak_col: str = "doc_id",
):
    """Latest-capture-wins crawl merge: Common Crawl re-captures the same
    url across snapshots; training corpora keep one capture per canonical
    url (usually the newest — CDX-dedup semantics). One hash aggregate:
    ``max_by(payload-struct, (ts, tiebreak))`` — partial-aggregates
    map-side (a window equivalent would shuffle + sort every capture),
    and per the measured gotcha max_by(payload, rank) beats
    max(struct(rank, payload)) ~2x when the payload is wide."""
    rank = F.struct(F.col(ts_col), F.col(tiebreak_col))
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(key_col)
        .agg(F.max_by(payload, rank).alias("__r"))
        .select("__r.*")
    )


def capture_intervals(
    df,
    *,
    key_col: str = "url",
    ts_col: str = "warc_us",
):
    """SCD2 validity intervalization: each capture of a key is valid from
    its own timestamp until the NEXT capture of the same key (open-ended
    ``valid_to = null`` for the current capture). Turns an append-only
    capture log into a temporal snapshot table — composed with
    ``operators.intervals.interval_join`` this answers "what content was
    live at time T" without a per-query sort (time travel over crawl
    history; latest_capture is the special case T = now).

    Scale: ONE lead() window partitioned by the key — bounded by captures
    per key (CDX cardinality, not corpus size), the same per-key history
    class as latest_capture's aggregate; a pathological single-url
    capture flood is capped upstream by domain_cap."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    return df.withColumn("valid_to", F.lead(F.col(ts_col)).over(w)).withColumnRenamed(
        ts_col, "valid_from"
    )


#: Bare-URL matcher (RE2-compatible: no lookarounds) for link extraction
#: from plain text / extracted main content.
URL_RE = r"""https?://[^\s"'<>]+"""


def link_graph(
    docs,
    *,
    text_col: str = "text",
    src_url_col: str = "url",
):
    """Host-level link graph from URLs embedded in document text:
    (src_host, dst_host, n_links). The input to PageRank-style quality
    priors, spam-cluster detection, and crawl frontier scoring.

    Scale: regexp_extract_all + explode is scan-side codegen; the only
    shuffle is the (src,dst) hash aggregate — map-side combined, and the
    mega-host rows it skews on are AQE-splittable."""
    src = registered_domain(host_of(F.col(src_url_col)))
    links = docs.select(
        src.alias("src_host"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)).alias(
            "__u"
        ),
    )
    dst = registered_domain(host_of(F.col("__u")))
    return (
        links.select("src_host", dst.alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_degrees(edges):
    """(host, out_degree, in_degree, out_links, in_links) from a
    link_graph edge table — two aggregates + one full outer join, all
    keyed on host."""
    out_d = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_degree"), F.sum("n_links").alias("out_links")
    )
    in_d = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_degree"), F.sum("n_links").alias("in_links")
    )
    return (
        out_d.join(in_d, "host", "full")
        .withColumn("out_degree", F.coalesce("out_degree", F.lit(0)))
        .withColumn("in_degree", F.coalesce("in_degree", F.lit(0)))
        .withColumn("out_links", F.coalesce("out_links", F.lit(0)))
        .withColumn("in_links", F.coalesce("in_links", F.lit(0)))
        .select("host", "out_degree", "in_degree", "out_links", "in_links")
    )


def snapshot_diff(
    old,
    new,
    *,
    key_col: str = "url",
    hash_col: str = "text_md5",
):
    """Crawl-snapshot CDC: (key, change, old_hash, new_hash) with change
    in {'added', 'removed', 'changed', 'unchanged'} — the incremental
    re-crawl planner's input (only 'added'/'changed' need re-extraction).

    Scale: one full-outer equi-join on the crawl key; both sides are
    pre-projected to (key, hash) so the shuffle carries 2 columns, never
    payloads. Downstream re-extraction joins the small changed-key set
    back against the new snapshot (semi-join, prunable)."""
    o = old.select(F.col(key_col).alias("k"), F.col(hash_col).alias("old_hash"))
    n = new.select(F.col(key_col).alias("k"), F.col(hash_col).alias("new_hash"))
    j = o.join(n, "k", "full")
    change = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") == F.col("new_hash"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        F.col("k").alias(key_col),
        change.alias("change"),
        "old_hash",
        "new_hash",
    )


def merge_upsert(
    target,
    changes,
    *,
    key_cols,
    version_col: str,
    delete_col: str | None = None,
    batch_partitions: int | None = None,
):
    """Apply a CDC change batch to a snapshot table — MERGE INTO semantics
    (Delta/Iceberg ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT /
    WHEN MATCHED AND is_delete DELETE``) expressed as plain DataFrames,
    the maintenance op that keeps a 100 TB latest-state table current
    from an append-only change stream (sibling of ``snapshot_diff``,
    which plans the batch; this one applies it).

    Semantics, per key:

    - the batch is first reduced last-writer-wins on ``version_col``
      (``max_by`` hash aggregate — partial-aggregates map-side, no
      window sort; (key, version) must be unique, same determinism
      contract as ``latest_capture``'s tiebreak);
    - a surviving change REPLACES the matched target row iff its version
      is >= the target's (stale replays — a re-delivered old change —
      are ignored, the at-least-once-delivery guard);
    - a fresh change with ``delete_col`` true removes the row (also
      swallowing delete-of-absent no-ops);
    - unmatched target rows pass through untouched.

    Output schema == target schema. ``changes`` must carry the key
    columns, every target payload column (incl. ``version_col``), and
    ``delete_col`` if given.

    Scale: one map-side-combinable aggregate over the batch + ONE
    full-outer equi-join on the keys. Full-outer joins can never
    broadcast in Spark, so the way to avoid re-shuffling the 100 TB
    snapshot every batch is the repo's bucketed-table layout
    (sources/bucketed.py): keep the snapshot bucketed on ``key_cols``
    and pass ``batch_partitions=<its bucket count>`` — the batch is
    then hash-repartitioned ONCE (to the bucket count; the aggregate
    AND the join both reuse that single exchange, ClusteredDistribution
    is count-agnostic) while the snapshot side reads bucket-aligned
    with no Exchange at all (plan-asserted in tests/test_plan.py).
    Writing the result back bucketed keeps the property for the next
    batch — the steady-state incremental-maintenance loop costs one
    small shuffle per batch, ever. Both inputs are pre-projected so the
    join carries no extra columns. Nothing is collected; no windows.

    Reference parity: none (the reference is stateless per-file) —
    beyond-reference pipeline surface, same family as snapshot_diff /
    latest_capture.
    """
    keys = list(key_cols)
    payload = [c for c in target.columns if c not in keys]
    if version_col not in payload:
        raise ValueError(f"version_col {version_col!r} must be a target payload column")
    ch_cols = payload + ([delete_col] if delete_col else [])
    missing = [c for c in keys + ch_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    ch = changes.select(*keys, *ch_cols)
    if batch_partitions:
        ch = ch.repartition(batch_partitions, *keys)
    reduced = ch.groupBy(*keys).agg(
        F.max_by(F.struct(*ch_cols), F.col(version_col)).alias("__c")
    )
    t = target.select(*keys, F.struct(*payload).alias("__t"))
    j = t.join(reduced, keys, "full")

    fresh = F.col("__c").isNotNull() & (
        F.col("__t").isNull()
        | (F.col("__c")[version_col] >= F.col("__t")[version_col])
    )
    deleted = fresh & (F.col("__c")[delete_col] if delete_col else F.lit(False))
    # per-field resolution (not a whole-struct CASE): the change struct
    # carries delete_col so the struct types differ, and field-wise
    # winners let column pruning drop anything downstream doesn't read
    return j.filter(~deleted).select(
        *keys,
        *[
            F.when(fresh, F.col("__c")[c]).otherwise(F.col("__t")[c]).alias(c)
            for c in payload
        ],
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    *,
    host_col: str = "host",
    path_col: str = "path",
    rule_host_col: str = "host",
    directive_col: str = "directive",
    prefix_col: str = "path_prefix",
    broadcast_rules: bool = True,
) -> DataFrame:
    """RFC 9309 robots.txt evaluation: for every (host, path) fetch
    candidate, the most-specific (longest path-prefix) matching rule
    decides; an allow beats a disallow of equal length; no matching rule
    means allowed. `rules` rows are (host, directive 'allow'|'disallow',
    path_prefix) for the crawler's user-agent group (agent resolution —
    and ``*``/``$`` wildcard expansion, which is a regex translation of
    the same longest-match contest — happen upstream when parsing the
    robots.txt bodies).

    The crawl-frontier politeness gate: at 10^12 candidate URLs the rule
    table is host-bounded (one robots.txt per host, dozens of rules), so
    the match is a BROADCAST equi-join on host + a prefix filter, and
    the winner is ONE max_by-shaped hash aggregate over matched pairs —
    no window over the frontier, no shuffle of it beyond the winner
    aggregate keyed by (host, path). Set ``broadcast_rules=False`` when
    the rule table itself is huge (every host on the web): the same plan
    becomes a plain equi-join that AQE can skew-split on hot hosts.

    Output: one row per DISTINCT (host, path) — (host, path, allowed,
    winner_prefix nullable, winner_directive nullable). A left join with
    the prefix test IN the join condition keeps no-match candidates
    alive through the single winner aggregate, so the frontier is
    scanned once and shuffled once.
    """
    r = rules.select(
        F.col(rule_host_col).alias("__rh"),
        F.col(directive_col).alias("__dir"),
        F.col(prefix_col).alias("__pfx"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    u = urls.select(F.col(host_col).alias("host"), F.col(path_col).alias("path"))
    cand = u.join(
        r,
        (F.col("host") == F.col("__rh")) & F.col("path").startswith(F.col("__pfx")),
        "left",
    )
    winner = F.when(
        F.col("__pfx").isNotNull(),
        F.struct(
            F.length("__pfx").alias("l"),
            (F.col("__dir") == "allow").alias("a"),
            F.col("__pfx").alias("p"),
            F.col("__dir").alias("d"),
        ),
    )
    return (
        cand.groupBy("host", "path")
        .agg(F.max(winner).alias("__w"))
        .select(
            "host",
            "path",
            F.coalesce(F.col("__w.a"), F.lit(True)).alias("allowed"),
            F.col("__w.p").alias("winner_prefix"),
            F.col("__w.d").alias("winner_directive"),
        )
    )


def crawl_frontier(
    frontier,
    *,
    n_workers: int,
    url_col: str = "url",
    priority_col: str = "priority",
    max_per_host: int | None = None,
    delays=None,
    cycle_seconds: float | None = None,
):
    """Politeness-aware fetch scheduling for a crawl frontier: every URL
    of a host maps to ONE worker (md5 hash shard), so per-host
    politeness (one in-flight fetch, crawl-delay pacing) is enforceable
    worker-locally with zero cross-executor coordination — the
    Mercator/Heritrix frontier rule (Najork & Heydon, "Mercator: A
    Scalable, Extensible Web Crawler", 1999) as a partitioning scheme.
    Within a host, ``slot`` is the fetch sequence number by descending
    priority (ties broken by url, so replays are stable); an optional
    ``max_per_host`` truncates mega-hosts to a per-cycle budget.

    Returns (url, host, worker, slot).

    ``delays`` (from `parse_robots_delays`: (host, crawl_delay)) +
    ``cycle_seconds`` turn the per-host truncation into a robots-aware
    fetch budget: a host stating Crawl-delay d gets at most
    floor(cycle_seconds / d) slots per cycle (0 when d exceeds the
    cycle — it waits), combined with ``max_per_host`` when both are
    given; hosts without a stated delay keep the plain cap.

    Scale: ONE shuffle, hash-partitioned on host. The per-host
    row_number window is not a skew accident — per-host sequencing IS
    the politeness contract — and ``max_per_host`` bounds what a
    mega-host can pin on one task; the worker id is derived from the
    host hash, never from a global ordering, so no stage sees the whole
    frontier. The md5 shard is dyadic-exact cross-engine (CLAUDE.md
    uniform-variate rule), which the contract exploits; the delay table
    is host-bounded, so its join broadcasts."""
    from pyspark.sql import Window

    if n_workers <= 0:
        raise ValueError("n_workers must be positive")
    if (delays is None) != (cycle_seconds is None):
        raise ValueError("delays and cycle_seconds must be given together")
    if cycle_seconds is not None and not cycle_seconds > 0:
        # floor(0/delay) = 0 would silently drop every delayed host
        raise ValueError("cycle_seconds must be positive")
    host = host_of(F.col(url_col))
    w = Window.partitionBy("host").orderBy(F.desc("__prio"), F.col("url"))
    out = (
        frontier.select(
            F.col(url_col).alias("url"),
            host.alias("host"),
            F.col(priority_col).alias("__prio"),
        )
        .withColumn("slot", F.row_number().over(w))
    )
    if max_per_host is not None:
        out = out.where(F.col("slot") <= int(max_per_host))
    if delays is not None:
        d = delays.select(
            F.col("host").alias("__dh"), F.col("crawl_delay").alias("__cd")
        )
        budget = F.when(
            F.col("__cd") > 0,
            F.floor(F.lit(float(cycle_seconds)) / F.col("__cd")),
        )  # delay 0 -> no stated constraint -> NULL budget
        out = (
            out.join(F.broadcast(d), out["host"] == F.col("__dh"), "left")
            .where(
                F.col("__cd").isNull()
                | budget.isNull()
                | (F.col("slot") <= budget)
            )
            .drop("__dh", "__cd")
        )
    worker = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
        % n_workers
    )
    return out.select(
        "url", "host", worker.alias("worker"), F.col("slot").cast("long").alias("slot")
    )


#: href + inner text of plain anchors (no nested markup) — group 1 is
#: the target, group 2 the anchor text. Same dialect in Java regex and
#: RE2 (no lookarounds, no laziness), so the contract mirrors it.
ANCHOR_TAG_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_texts(
    pages,
    *,
    html_col: str = "html",
    url_col: str = "url",
):
    """Anchor-text aggregation: how the web describes each TARGET page
    — the classic off-page relevance/quality signal (anchor terms feed
    search ranking, seed expansion, and spam detection; every
    link-graph pipeline from Brin & Page onward aggregates them).
    Extracts ``<a href>`` pairs with two group-indexed
    ``regexp_extract_all`` calls (hrefs and texts stay aligned by match
    order — one scan, no per-tag re-matching), explodes to (dst, term)
    and aggregates ``n_mentions`` (term occurrences across all anchors
    pointing at dst) and ``n_pages`` (distinct linking pages).

    Compose with ``canonicalize_url`` on the href column upstream when
    crawl hrefs are raw.

    Scale: extraction is scan-side codegen; the only shuffle is the
    (dst, term) hash aggregate — map-side combined, and the n_pages
    distinct is a two-level aggregate on the same key (no global
    distinct). Mega-targets (everyone links google.com) skew the key
    like any hot aggregate key: AQE-splittable, no window involved."""
    html = F.col(html_col)
    hrefs = F.regexp_extract_all(html, F.lit(ANCHOR_TAG_RE), F.lit(1))
    txts = F.regexp_extract_all(html, F.lit(ANCHOR_TAG_RE), F.lit(2))
    pairs = pages.select(
        F.col(url_col).alias("src"),
        F.explode(F.arrays_zip(hrefs.alias("dst"), txts.alias("txt"))).alias(
            "__p"
        ),
    ).select("src", F.col("__p.dst").alias("dst"), F.col("__p.txt").alias("txt"))
    terms = pairs.select(
        "src",
        "dst",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("txt"), r"\s+", " ")), " ")
        ).alias("term"),
    ).where(F.col("term") != "")
    return terms.groupBy("dst", "term").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("src").alias("n_pages"),
    )


def url_templates(
    pages,
    *,
    url_col: str = "url",
):
    """Cluster a host's URL space by path TEMPLATE — digit runs fold to
    ``{n}``, long hex runs (session ids, content hashes) to ``{hex}`` —
    and count members per (host, template) with a deterministic example
    (min url). The crawl-budget diagnostic every frontier needs:
    calendar/pagination/session templates generate unbounded URL spaces
    from finite content, and their member counts say where dedup-by-
    canonicalization or crawl caps should bite.

    Scale: template derivation is two scan-side regexp_replaces; the
    only shuffle is the (host, template) map-side-combined aggregate
    (min(url) rides the same combine)."""
    u = F.col(url_col)
    host = host_of(u)
    path = F.regexp_extract(u, _SCHEME + r"[^/?#]*([^?#]*)", 1)
    template = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{hex}"), r"[0-9]+", "{n}"
    )
    return pages.groupBy(
        host.alias("host"), template.alias("template")
    ).agg(
        F.count("*").alias("n_urls"),
        F.min(u).alias("example_url"),
    )


def parse_robots(
    bodies,
    agent: str,
    *,
    host_col: str = "host",
    body_col: str = "robots_txt",
):
    """Parse raw robots.txt bodies into the (host, directive,
    path_prefix) rule table `robots_allowed` consumes — the upstream
    seam that function's docstring names. RFC 9309 group semantics:
    comments (#…) strip; consecutive ``User-agent`` lines open ONE
    group owning the following allow/disallow rules; rules before any
    User-agent line are ignored. Group selection per host: a group
    matches when its agent token is ``*`` or a case-insensitive
    substring of ``agent``; the longest matching token wins (``*``
    scores 0 — the RFC's most-specific-match rule), and ALL groups at
    the winning score contribute rules (the RFC merges same-agent
    groups). Empty-value ``Disallow:`` lines (the classic allow-all
    idiom) survive as prefix '' rules, which is exactly how the
    evaluator treats them.

    Scale: one posexplode of body lines, two per-host line-ordered
    window passes (group numbering + winning-score fill) — robots
    bodies are KB-sized per host, so the host partition is tiny by
    construction; the output is the broadcast-sized rule table."""
    rules = _robots_winning_rules(bodies, agent, host_col, body_col)
    return (
        rules.where(F.col("directive").isin("allow", "disallow"))
        .select("host", "directive", F.col("value").alias("path_prefix"))
        .distinct()
    )


def _robots_winning_rules(bodies, agent: str, host_col: str, body_col: str):
    """Shared RFC 9309 group resolution: (host, directive, value) rows of
    the winning user-agent group(s), directives allow / disallow /
    crawl-delay. The grouping pass must SEE every recognized directive —
    filtering kinds first would make two User-agent lines separated only
    by (say) allow rules look like one UA run and merge their groups."""
    from pyspark.sql import Window

    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "line_no", "__raw"
        ),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", "")).alias("__l"),
    )
    kind = F.lower(
        F.regexp_extract(
            F.col("__l"), r"(?i)^(user-agent|allow|disallow|crawl-delay)\s*:", 1
        )
    )
    value = F.trim(F.regexp_extract(F.col("__l"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    w = Window.partitionBy("host").orderBy("line_no")
    tagged = lines.select(
        "host", "line_no", kind.alias("kind"), value.alias("value")
    ).where(F.col("kind") != "")
    is_ua = F.col("kind") == "user-agent"
    new_group = is_ua & ~F.coalesce(F.lag(is_ua, 1).over(w), F.lit(False))
    g = tagged.withColumn(
        "gid", F.sum(new_group.cast("int")).over(w)
    ).where(F.col("gid") > 0)

    uas = g.where(is_ua).select(
        "host",
        "gid",
        F.when(F.col("value") == "*", F.lit(0))
        .when(
            F.instr(F.lit(agent.lower()), F.lower(F.col("value"))) > 0,
            F.length("value"),
        )
        .alias("__score"),
    ).where(F.col("__score").isNotNull())
    best = uas.groupBy("host").agg(F.max("__score").alias("__best"))
    win_gids = (
        uas.join(best, "host")
        .where(F.col("__score") == F.col("__best"))
        .select("host", "gid")
        .distinct()
    )
    return g.where(~is_ua).join(win_gids, ["host", "gid"]).select(
        "host",
        F.col("kind").alias("directive"),
        "value",
    )


def parse_robots_delays(
    bodies,
    agent: str,
    *,
    host_col: str = "host",
    body_col: str = "robots_txt",
):
    """(host, crawl_delay): the winning user-agent group's Crawl-delay in
    seconds. The directive is non-standard (RFC 9309 leaves it out;
    Bing/Yandex honor it) so semantics are pinned here: non-numeric or
    negative values drop (try_cast — crawl noise must never throw under
    ANSI), and when the winning group states several delays the LARGEST
    wins (conservative politeness). Hosts with no delay emit no row —
    the frontier's default applies. Same group resolution (and the same
    scale shape) as `parse_robots`."""
    rules = _robots_winning_rules(bodies, agent, host_col, body_col)
    delay = F.col("value").try_cast("double")
    return (
        rules.where(F.col("directive") == "crawl-delay")
        .select("host", delay.alias("__d"))
        .where(F.col("__d").isNotNull() & (F.col("__d") >= 0))
        .groupBy("host")
        .agg(F.max("__d").alias("crawl_delay"))
    )


def parse_sitemaps(
    sitemaps,
    *,
    xml_col: str = "sitemap_xml",
    host_col: str = "host",
):
    """Parse sitemap.xml bodies (sitemaps.org protocol) into frontier
    seeds: ``<urlset>`` entries yield kind='url' rows, ``<sitemapindex>``
    entries kind='sitemap' rows (the recursion the fetch loop follows);
    optional ``<lastmod>`` survives as both raw string and try_cast
    DATE (W3C datetimes truncate to their date part, crawl-noise values
    go NULL instead of throwing under ANSI). Output: (host, kind, loc,
    lastmod, lastmod_date).

    Scale: two scan-side entry explodes + per-entry regexp extracts;
    no shuffle. Entity-unescape loc via htmltables.unescape_basic
    downstream if feeds embed &amp; (sitemaps.org requires escaping)."""
    xml = F.col(xml_col)

    def entries(tag: str, kind: str):
        ent = F.explode(
            F.regexp_extract_all(
                xml, F.lit(rf"(?s)<{tag}>.*?</{tag}>"), F.lit(0)
            )
        )
        e = sitemaps.select(
            F.col(host_col).alias("host"), ent.alias("__e")
        )
        loc = F.trim(F.regexp_extract(F.col("__e"), r"(?s)<loc>(.*?)</loc>", 1))
        lastmod = F.trim(
            F.regexp_extract(F.col("__e"), r"(?s)<lastmod>(.*?)</lastmod>", 1)
        )
        return e.select(
            "host",
            F.lit(kind).alias("kind"),
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            F.try_to_date(F.substring(lastmod, 1, 10)).alias("lastmod_date"),
        ).where(F.col("loc") != "")

    return entries("url", "url").unionByName(entries("sitemap", "sitemap"))


def recrawl_priority(
    captures,
    seeds,
    *,
    url_col: str = "url",
    captured_col: str = "captured_date",
    lastmod_col: str = "lastmod_date",
    asof_col: str = "asof_date",
):
    """Staleness-driven refresh ranking: join the last-capture record
    per url against sitemap/feed seeds and tier the frontier —
    tier 1 = never captured (discovery), tier 2 = publisher says stale
    (lastmod after our capture), tier 3 = revisit by age. ``priority``
    is days-stale within the tier (tier 2: lastmod − captured; tier 3:
    asof − captured; tier 1: a large sentinel so discovery sorts
    first under (tier ASC, priority DESC)). The standard incremental-
    recrawl scheduling rule (freshness-aware crawl ordering à la Cho &
    Garcia-Molina 2000), ready to feed `crawl_frontier`.

    Scale: one equi-join on url (both sides skinny: seeds are feed
    rows, captures come pre-aggregated from `latest_capture`) + a
    projection. NULL-safe date arithmetic via datediff on DATEs."""
    s = seeds.select(
        F.col(url_col).alias("url"), F.col(lastmod_col).alias("__lm")
    )
    c = captures.select(
        F.col(url_col).alias("url"),
        F.col(captured_col).alias("__cap"),
        F.col(asof_col).alias("__asof"),
    )
    j = s.join(c, "url", "left")
    tier = (
        F.when(F.col("__cap").isNull(), F.lit(1))
        .when(
            F.col("__lm").isNotNull() & (F.col("__lm") > F.col("__cap")),
            F.lit(2),
        )
        .otherwise(F.lit(3))
    )
    priority = (
        F.when(F.col("__cap").isNull(), F.lit(10_000))
        .when(
            F.col("__lm").isNotNull() & (F.col("__lm") > F.col("__cap")),
            F.datediff(F.col("__lm"), F.col("__cap")),
        )
        .otherwise(F.datediff(F.col("__asof"), F.col("__cap")))
    )
    return j.select(
        "url", tier.alias("tier"), priority.cast("long").alias("days_stale")
    )


def domain_lang_mix(
    docs,
    *,
    url_col: str = "url",
    lang_col: str = "lang",
):
    """(domain, lang, n_docs, share): per-registrable-domain language
    composition — the multilingual-crawl audit (CCNet/OSCAR slice
    sanity: a .br domain suddenly 90% 'en' is an extraction or lang-id
    regression, a mixed domain informs per-language routing).

    Scale: one (domain, lang) map-side-combined aggregate + a domain
    total via a second aggregate joined back (both keyed on the derived
    domain; no window)."""
    dom = registered_domain(host_of(F.col(url_col)))
    by_pair = docs.groupBy(
        dom.alias("domain"), F.col(lang_col).alias("lang")
    ).agg(F.count("*").alias("n_docs"))
    totals = by_pair.groupBy("domain").agg(F.sum("n_docs").alias("__t"))
    return by_pair.join(totals, "domain").select(
        "domain",
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("__t"), 6).alias("share"),
    )

"""X55: URL canonicalization + URL-keyed dedup (SURVEY §2.11
extension; round 10).  A crawl frontier and its post-hoc dedup both
need ONE canonical spelling per resource: the same page arrives as
``HTTP://WWW.Example.COM:80/a//b/?utm_source=x&id=2#frag`` and
``http://example.com/a/b?id=2``, and treating those as distinct
documents double-counts every popular page (and leaks near-identical
rows past URL-keyed sampling).  This is the hygiene pass that runs
BEFORE text-level dedup ever sees the bytes.

The default path is pure column expressions (regexp + array ops — no
UDF, no explode): canonicalization is embarrassingly map-only and must
stay inside whole-stage codegen at 100 TB.  The one exception is
OPT-IN: ``fold_idn=True`` folds internationalized (non-ASCII) hosts to
their punycode form through a single Arrow-batched pandas_udf over the
stdlib idna codec — no expression can run the IDNA bootstring
algorithm, ASCII hosts take a fast path inside the batch, and the
default stays expression-only (plan-pinned).

Canonical form (each rule is pinned by a planted test):

- percent-encoding normalized per RFC 3986 (round 11, VERDICT r10 #3):
  ``%XX`` sequences that encode UNRESERVED characters
  (ALPHA / DIGIT / ``-._~``) are decoded (``%7Ea`` = ``~a``,
  ``%41`` = ``A``), all remaining hex digits uppercased
  (``%3a`` = ``%3A``); a ``%`` not followed by two hex digits is kept
  verbatim.  Decoding only unreserved characters can never create a
  delimiter, so the rewrite is structure-safe and runs once over the
  whole after-scheme text before any parsing;

- scheme and host lowercase; only http/https qualify (anything else —
  including schemeless strings — canonicalizes to NULL: an
  un-canonicalizable URL must be visibly invalid, not silently passed
  through);
- userinfo dropped, default ports dropped (:80 http / :443 https),
  non-default ports kept;
- leading ``www.`` stripped (``strip_www=False`` opts out — it IS a
  distinct origin, but crawl dedup almost always folds it);
- path: duplicate slashes collapsed, trailing slash stripped (root
  stays ``/``; an empty path becomes ``/``); path CASE IS KEPT (paths
  are case-sensitive by spec, unlike host);
- query: tracking params dropped (utm_*, fbclid, gclid, msclkid,
  yclid, ref, ref_src), the rest SORTED by full ``k=v`` text so
  param order never splits a URL, empty query dropped;
- fragment dropped (never sent to the server).

Canonicalization is IDEMPOTENT (canon(canon(u)) = canon(u), property-
pinned) — safe to re-run over an already-clean frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|yclid|ref|ref_src)="


def _percent_normalize(s: Column) -> Column:
    """RFC 3986 percent-encoding normalization, pure expressions:
    split on '%', then each following piece either decodes (first two
    chars are hex spelling an unreserved octet — ALPHA/DIGIT/-._~),
    uppercases its hex (valid but reserved/other), or keeps the bare
    '%' verbatim (not a valid escape).  Idempotent: a first pass
    leaves no unreserved escapes and only uppercase hex, which a
    second pass maps to itself (the hypothesis property covers it)."""

    def _fix(p: Column) -> Column:
        # p is a lambda variable — references are cheap, no tree copies
        hexs = F.upper(F.substring(p, 1, 2))
        tail = F.substring(p, 3, 2147483647)
        valid = hexs.rlike("^[0-9A-F]{2}$")
        code = F.conv(hexs, 16, 10).cast("int")
        unreserved = (
            ((code >= 48) & (code <= 57))     # DIGIT
            | ((code >= 65) & (code <= 90))   # ALPHA upper
            | ((code >= 97) & (code <= 122))  # ALPHA lower
            | code.isin(45, 46, 95, 126)      # - . _ ~
        )
        return (
            F.when(valid & unreserved, F.concat(F.char(code), tail))
            .when(valid, F.concat(F.lit("%"), hexs, tail))
            .otherwise(F.concat(F.lit("%"), p))
        )

    # ONE reference to the split array (index-aware transform: element
    # 0 precedes the first '%' and passes through) — naming the array
    # in several expressions would copy the whole upstream tree into
    # each, and canonicalize_url composes this under components that
    # are themselves referenced repeatedly (the canon∘canon test blew
    # an 8 MiB task binary / codegen OOM on the triple-reference form)
    return F.array_join(
        F.transform(
            F.split(s, "%", -1),
            lambda p, i: F.when(i == F.lit(0), p).otherwise(_fix(p)),
        ),
        "",
    )


def _idna_fold(host: Column) -> Column:
    """Non-ASCII host labels -> punycode (xn--) form via the stdlib
    idna codec — ONE Arrow-batched pandas_udf, the only non-expression
    step in the module and opt-in (``fold_idn=True``).  ASCII hosts
    pass through untouched (fast path inside the batch — folding is
    a no-op on already-ASCII names, which keeps canonicalization
    idempotent); hosts the codec rejects (empty labels, overlong
    labels) fold to NULL, the module's loud-invalid convention."""
    from pyspark.sql.functions import pandas_udf

    def _fold_series(hosts):
        def f(h):
            if h is None:
                return None
            if h.isascii():
                return h
            try:
                return h.encode("idna").decode("ascii")
            except Exception:
                return None

        return hosts.map(f)

    # explicit returnType (no decorator): `from __future__ import
    # annotations` stringifies type hints, which pandas_udf's hint
    # inference can't resolve against a function-local pandas import
    # (the text.py unicode-normalize pattern)
    fold = pandas_udf(_fold_series, "string")
    return fold(host)


def canonicalize_url(
    col: str | Column, strip_www: bool = True, fold_idn: bool = False
) -> Column:
    """The canonical spelling of an http(s) URL, or NULL when the
    input isn't one (see the module docstring for the exact rules).
    ``fold_idn=True`` additionally folds non-ASCII hosts to punycode
    (one pandas_udf step — the default stays expression-only)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    # everything after ://, fragment dropped at the extraction; percent
    # escapes normalized BEFORE any parsing (decoding unreserved chars
    # can't create delimiters, so the structure regexes see stable text)
    rest = _percent_normalize(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    )
    hostport = F.lower(
        # userinfo (user:pass@) dropped
        # GREEDY to the LAST @ — a host can't legally contain @, and a
        # lazy strip left "@" as the host for "@@" inputs, breaking
        # idempotence (hypothesis counterexample)
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^.*@", "")
    )
    host = F.regexp_replace(hostport, r":\d*$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    if fold_idn:
        host = _idna_fold(host)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path == "/", path).otherwise(F.regexp_replace(path, r"/$", ""))
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.lower(p).rlike(_TRACKING_RE),
        )
    )
    q_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    port_part = F.when(
        default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(
        scheme.isin("http", "https") & (host != ""), canon
    ).otherwise(F.lit(None).cast("string"))


def extract_host(
    col: str | Column, strip_www: bool = True, fold_idn: bool = False
) -> Column:
    """The lowercase host of an http(s) URL (NULL when invalid) — the
    grouping key for per-site quotas, blocklists, and crawl budgets.
    Percent escapes are normalized first (``ex%61mple.com`` =
    ``example.com``); ``fold_idn=True`` folds non-ASCII hosts to
    punycode.  eTLD+1 ("registered domain") extraction needs the
    public-suffix list — a last-two-labels guess is wrong for half the
    world's ccTLDs (``example.co.uk``) — and lives in
    :func:`extract_registered_domain`, driven by a caller-provided PSL
    snapshot (the list is public data that updates on its own cadence,
    so it enters as a table, not a vendored constant)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = _percent_normalize(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    )
    hostport = F.lower(
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^.*@", "")
    )
    host = F.regexp_replace(hostport, r":\d*$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    if fold_idn:
        host = _idna_fold(host)
    return F.when(
        scheme.isin("http", "https") & (host != ""), host
    ).otherwise(F.lit(None).cast("string"))


def parse_psl_rules(spark, lines: list[str]) -> DataFrame:
    """Public-suffix-list rules (publicsuffix.org format: one rule per
    line, ``//`` comments, ``*.`` wildcards matching exactly one
    label, ``!`` exceptions) -> a broadcast-sized rules frame
    (suffix, match_labels, ps_labels, is_exception, is_wildcard):

    - normal rule ``co.uk``: matches the host suffix ``co.uk``; the
      public suffix is that match (ps_labels = match_labels);
    - wildcard ``*.ck``: stored by its BASE (``ck``); matches any host
      whose last match_labels labels equal the base AND that has at
      least one more label to fill the ``*`` — the public suffix is
      base + that label (ps_labels = match_labels + 1);
    - exception ``!www.ck``: matches its literal suffix and wins over
      every other matching rule; the public suffix drops the leftmost
      label (ps_labels = match_labels - 1).

    Parsing is driver-side (the full PSL is ~15k lines — broadcast
    territory by construction)."""
    rows = []
    for ln in lines:
        t = ln.strip()
        if not t or t.startswith("//"):
            continue
        if t.startswith("!"):
            body = t[1:].lower()
            k = body.count(".") + 1
            rows.append((body, k, k - 1, True, False))
        elif t.startswith("*."):
            base = t[2:].lower()
            k = base.count(".") + 1
            rows.append((base, k, k + 1, False, True))
        else:
            t = t.lower()
            k = t.count(".") + 1
            rows.append((t, k, k, False, False))
    return spark.createDataFrame(
        rows,
        "suffix string, match_labels int, ps_labels int,"
        " is_exception boolean, is_wildcard boolean",
    )


def extract_registered_domain(
    df: DataFrame,
    host_col: str,
    rules: DataFrame,
    out_col: str = "registered_domain",
    max_labels: int = 8,
) -> DataFrame:
    """df + ``out_col`` = the eTLD+1 ("registered domain") of each
    host under the caller-provided PSL ``rules`` (parse_psl_rules) —
    the per-SITE key crawl quotas and dedup budgets actually want
    (``a.example.co.uk`` and ``b.example.co.uk`` are one site;
    ``example.co.uk`` and ``other.co.uk`` are not).

    Semantics follow the publicsuffix.org algorithm (most-labels rule
    prevails, exceptions win outright, wildcards consume one extra
    label) with ONE loud deviation: a host matching NO rule yields
    NULL instead of the spec's implicit ``*`` fallback — an unlisted
    TLD in a crawl is far more often garbage than a real registry, and
    a silent last-two-labels guess is exactly the bug this operator
    exists to avoid (VERDICT r10 #3).  A host that IS its own public
    suffix (``co.uk``, ``foo.ck`` under ``*.ck``) also yields NULL —
    there is no registrable part.

    Shape: DISTINCT hosts -> ≤ ``max_labels`` candidate suffixes each
    (one bounded explode over the host table, never the corpus) ->
    broadcast join against the rules -> per-host max -> host-keyed
    join back onto df.  O(|distinct hosts|), corpus touched once."""
    hosts = (
        df.select(F.col(host_col).alias("__h"))
        .filter(F.col("__h").isNotNull() & (F.col("__h") != ""))
        .distinct()
    )
    labels = F.split(F.col("__h"), r"\.")
    n = F.size(labels)
    cands = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda k: F.struct(
            F.array_join(F.slice(labels, n - k + 1, k), ".").alias("cand"),
        ),
    )
    ex = hosts.select(
        "__h", n.alias("__n"), F.explode(cands).alias("c")
    ).select("__h", "__n", F.col("c.cand").alias("__cand"))
    m = ex.join(
        F.broadcast(rules), ex["__cand"] == rules["suffix"]
    ).filter(
        # a wildcard needs a real label to fill its * — without one the
        # rule doesn't match at all (host "ck" under "*.ck")
        (~F.col("is_wildcard")) | (F.col("__n") >= F.col("ps_labels"))
    )
    best = m.groupBy("__h", "__n").agg(
        F.max(F.when(F.col("is_exception"), F.col("ps_labels"))).alias(
            "__exc"
        ),
        F.max(F.when(~F.col("is_exception"), F.col("ps_labels"))).alias(
            "__norm"
        ),
    )
    ps = F.coalesce(F.col("__exc"), F.col("__norm"))
    labels2 = F.split(F.col("__h"), r"\.")
    reg = F.when(
        F.col("__n") >= ps + 1,
        F.array_join(
            F.slice(labels2, F.col("__n") - ps, ps + 1), "."
        ),
    )
    mapping = best.select(F.col("__h"), reg.alias(out_col))
    return df.join(
        mapping, df[host_col] == mapping["__h"], "left"
    ).drop("__h")


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    strip_www: bool = True,
) -> DataFrame:
    """One row per canonical URL — the LOWEST id wins (deterministic
    across runs/partitionings, the house survivor rule).  Rows whose
    URL doesn't canonicalize are KEPT, each its own group (an invalid
    URL is not evidence two documents are the same resource).  One
    map-only canonicalization + one groupBy shuffle on the canonical
    key; high-cardinality by construction."""
    canon = canonicalize_url(url_col, strip_www).alias("canonical_url")
    keyed = df.select(F.col(id_col), F.col(url_col), canon)
    valid = (
        keyed.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.min_by(F.col(url_col), F.col(id_col)).alias(url_col),
            F.count("*").cast("long").alias("n_duplicates"),
        )
        .select(id_col, url_col, "canonical_url", "n_duplicates")
    )
    invalid = keyed.filter(F.col("canonical_url").isNull()).select(
        id_col, url_col, "canonical_url", F.lit(1).cast("long").alias("n_duplicates")
    )
    return valid.unionByName(invalid)


class SeenUrlSet:
    """X61'': persisted canonical-URL membership set — the crawl
    frontier's cross-batch dedup ("have we EVER seen this resource?"),
    joining the engine's index family (DedupIndex / FuzzyIndex /
    IvfIndex / InvertedIndex) with the same
    build/append/stats/compact lifecycle.  One parquet table of
    canonical URLs under ``path/seen``; reads are ANTI-JOINS, so
    replayed appends cost storage and shuffle volume, never
    correctness (the DedupIndex severity, not the IVF one) — the
    streaming health log applies the storage-only COMPACT_RATIO
    wording.  The set stores CANONICAL spellings only (the caller
    canonicalizes first — url_dedup's output), so two spellings of a
    resource can never both look new."""

    DUPLICATION_IS_CORRECTNESS = False

    def __init__(self, path: str):
        self.path = path.rstrip("/")

    @property
    def seen_path(self) -> str:
        return f"{self.path}/seen"

    def _read(self, spark) -> DataFrame:
        # explicit schema: an empty-seed build leaves a file-less dir
        # that inference cannot read (the IvfIndex empty-seed rule)
        return spark.read.schema("canonical_url string").parquet(
            self.seen_path
        )

    def build(self, urls: DataFrame, url_col: str = "canonical_url") -> None:
        """Create the set from an initial frontier snapshot (possibly
        empty — streaming loops build on empty seeds)."""
        urls.select(
            F.col(url_col).alias("canonical_url")
        ).filter(F.col("canonical_url").isNotNull()).distinct().write.mode(
            "overwrite"
        ).parquet(self.seen_path)

    def append(self, urls: DataFrame, url_col: str = "canonical_url") -> None:
        """Fold a batch of NEWLY-seen canonical URLs in (batch-sized
        parquet append; the caller has already filtered against the
        set, so rows here are new by construction — a replayed append
        re-adds them, which the anti-join reads absorb)."""
        urls.select(
            F.col(url_col).alias("canonical_url")
        ).filter(F.col("canonical_url").isNotNull()).distinct().write.mode(
            "append"
        ).parquet(self.seen_path)

    def filter_new(
        self, spark, batch: DataFrame, url_col: str = "canonical_url"
    ) -> DataFrame:
        """Rows of ``batch`` whose canonical URL the set has never
        seen — one anti-join on the canonical key."""
        seen = self._read(spark).withColumnRenamed(
            "canonical_url", url_col
        )
        return batch.join(seen, url_col, "left_anti")

    def stats(self, spark) -> dict:
        """Replay-duplication health (rows vs distinct) — the
        storage-cost cue the maintenance log reads."""
        row = self._read(spark).agg(
            F.count("*").alias("n"),
            F.count_distinct("canonical_url").alias("d"),
        ).collect()[0]
        n, d = int(row["n"] or 0), int(row["d"] or 0)
        return {
            "seen_rows": n,
            "seen_distinct": d,
            "duplication_ratio": round(n / d, 4) if d else 1.0,
        }

    def compact(self, spark) -> None:
        """Drop replayed-append duplicates (pin before overwriting the
        path being read — the house compact pattern)."""
        from covid19i2b2_spark.caching import release_local_checkpoint

        seen = self._read(spark).distinct().localCheckpoint(eager=True)
        seen.write.mode("overwrite").parquet(self.seen_path)
        release_local_checkpoint(seen)

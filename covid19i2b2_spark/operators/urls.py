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
    # host SHAPE guard (round 12): "http://::" used to leave ":" as the
    # host — non-empty, so it canonicalized to "http://:/", whose
    # re-canonicalization is NULL (hypothesis idempotence
    # counterexample).  A registered-name host can't contain
    # : / ? @ [ ] or whitespace; bracketed IPv6 literals are the one
    # colon-bearing form and are allowed explicitly.  Anything else is
    # loud NULL, which is idempotent by construction.
    valid_host = host.rlike(r"^(\[[0-9a-f:.]+\]|[^\[\]:/?@\s]+)$")
    # raw whitespace anywhere in the (trimmed) URL is invalid per RFC
    # 3986 (spaces must be percent-encoded) — and non-idempotent here:
    # a surviving "?a " query would be re-trimmed on re-entry
    # (hypothesis counterexample 'http://0? &').  Loud NULL.
    no_ws = ~u.rlike(r"\s")
    return F.when(
        scheme.isin("http", "https") & valid_host & no_ws, canon
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
    from covid19i2b2_spark.fsutil import one_partition_df

    return one_partition_df(
        spark,
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


def parse_disallow_rules(spark, lines: list[str]) -> DataFrame:
    """Robots/blocklist disallow rules (round 12, VERDICT r11 missing
    #3) — the parse_psl_rules pattern applied to disallow prefixes.
    One rule per line, ``#`` comments, case-insensitive:

    - ``example.com/private`` — on host ``example.com`` exactly, block
      every URL whose path starts with ``/private``;
    - ``example.com`` (no path, or path ``/``) — block the whole host;
    - ``.example.com[/p]`` — dot-anchored: the rule also matches every
      SUBDOMAIN (``example.com`` itself and ``a.b.example.com``) — the
      conventional blocklist spelling for domain-level blocks.

    Only the HOST is case-folded — paths are case-sensitive by spec
    (review r12: lowercasing the whole line made any rule with an
    uppercase path character silently never fire).  A leading ``www.``
    is stripped from the rule host (review r12): URL hosts arrive
    www-stripped from canonicalize_url/extract_host, so an unstripped
    ``www.badsite.com`` rule could never match — and post-
    canonicalization the two spellings are the same site anyway.

    Driver-side parse (blocklists are broadcast-sized by construction —
    robots.txt corpora distill to per-host prefix sets far smaller
    than the frontier).  -> (rule_host, is_suffix, prefix)."""
    rows = []
    for ln in lines:
        t = ln.strip()
        if not t or t.startswith("#"):
            continue
        slash = t.find("/")
        if slash == -1:
            host, prefix = t, "/"
        else:
            host, prefix = t[:slash], t[slash:]
        host = host.lower()
        is_suffix = host.startswith(".")
        host = host.lstrip(".")
        if not host:
            raise ValueError(f"disallow rule has no host: {ln!r}")
        prefix = prefix or "/"
        if host.startswith("www."):
            if is_suffix:
                # '.www.X': keep the suffix rule for deep subdomains
                # (a.www.X is NOT www-stripped by canonicalization) and
                # add the folded apex as an EXACT rule — a bare
                # www-strip would broaden the rule to all of .X
                # (review r12 #2).  Post-canonicalization www.X and X
                # are the same resource set, so the apex rule covering
                # both is inherent to strip_www, not added scope.
                rows.append((host, True, prefix))
                rows.append((host[4:], False, prefix))
                continue
            host = host[4:]
        rows.append((host, is_suffix, prefix))
    from covid19i2b2_spark.fsutil import one_partition_df

    return one_partition_df(
        spark, rows, "rule_host string, is_suffix boolean, prefix string"
    )


def mark_disallowed(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "canonical_url",
    out_col: str = "is_disallowed",
    max_labels: int = 8,
) -> DataFrame:
    """df + boolean ``out_col``: True where the URL's host matches a
    disallow rule (exactly, or as a dot-anchored suffix) and its
    PATH+QUERY starts with the rule's prefix — the flag form the crawl
    pipeline consumes in one plan (no allowed/blocked union, so the
    corpus chain evaluates once; review r12 #7).  Rows with NULL or
    hostless URLs flag False (exclusion is a policy on real resources;
    invalid rows stay on their own loud path downstream).

    Matching semantics (each a review-r12 under-blocking fix):

    - the matched text is the path INCLUDING the query string —
      RFC 9309 matching covers both, so ``Disallow: /search?`` must be
      able to fire; a fragment never reaches the server and is
      excluded;
    - a trailing-slash directory prefix also matches the directory URL
      itself (``/private/`` blocks canonical ``/private``, whose
      trailing slash canonicalize_url strips) — exact match on the
      slash-less spelling, so ``/privateer`` stays allowed;
    - the per-host candidate-suffix cap self-sizes to the LONGEST rule
      host (one tiny aggregate over the broadcast-sized rules), so
      deep dot-anchored rules never silently stop matching at a fixed
      ``max_labels``.

    Shape (nothing corpus-sized shuffles): candidate host suffixes are
    a bounded per-row array over the DISTINCT hosts, the rules join is
    a broadcast, and the corpus sees ONE broadcast join against the
    per-host effective-prefix lists + an array ``exists`` — a pure
    policy column on the scan."""
    # pin the rules ONCE (review r12 #4): they feed the self-sizing
    # aggregate below AND the broadcast join — without the checkpoint
    # a robots-parse-derived rules plan (window pass over 10^6+
    # bodies) would execute twice per call.  Rules are broadcast-sized
    # by contract, so the materialization is bounded; the one upfront
    # job is the price of self-sizing (documented at the pipeline).
    rules = rules.select(
        "rule_host", "is_suffix", "prefix"
    ).localCheckpoint(eager=True)
    # self-size the suffix cap to the rules (review r12 #8): a
    # dot-anchored rule longer than the cap would otherwise silently
    # never match deeper hosts
    rmax = rules.agg(
        F.max(F.size(F.split("rule_host", r"\."))).alias("m")
    ).collect()[0]["m"]
    max_labels = max(max_labels, int(rmax or 1))
    # path + query, fragment excluded (RFC 9309 matches both); a
    # query-only URL ("http://h.com?x") matches as "/?x"
    rest = F.regexp_extract(F.col(url_col), r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    path = F.when(rest == "", F.lit("/")).otherwise(
        F.when(rest.startswith("/"), rest).otherwise(
            F.concat(F.lit("/"), rest)
        )
    )
    work = df.withColumn(
        "__fd_host", extract_host(F.col(url_col))
    ).withColumn("__fd_path", path)
    hosts = (
        work.select(F.col("__fd_host").alias("__h"))
        .filter(F.col("__h").isNotNull() & (F.col("__h") != ""))
        .distinct()
    )
    labels = F.split(F.col("__h"), r"\.")
    n = F.size(labels)
    cands = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda k: F.struct(
            F.array_join(F.slice(labels, n - k + 1, k), ".").alias("cand"),
            (k == n).alias("full"),
        ),
    )
    # the full host is always a candidate, even past the cap —
    # exact-host rules must never silently stop matching deep hosts
    cands = F.array_union(
        cands,
        F.array(
            F.struct(
                F.col("__h").alias("cand"), F.lit(True).alias("full")
            )
        ),
    )
    ex = hosts.select(
        "__h", F.explode(cands).alias("c")
    ).select("__h", F.col("c.cand").alias("__cand"), F.col("c.full").alias("__full"))
    eff = (
        ex.join(F.broadcast(rules), ex["__cand"] == rules["rule_host"])
        .filter(F.col("is_suffix") | F.col("__full"))
        .select(F.col("__h").alias("__rh"), F.col("prefix").alias("__pfx"))
        .distinct()
        .groupBy("__rh")
        .agg(F.collect_list("__pfx").alias("__pfxs"))
    )
    def _pfx_hit(p):
        # a directory rule ('/x/') must also match the canonicalized
        # directory URL, whose trailing slash canonicalize_url strips:
        # exactly '/x', or '/x?query' (review r12 #1) — NOT '/xy'
        stem = p.substr(F.lit(1), F.length(p) - F.lit(1))
        return F.col("__fd_path").startswith(p) | (
            p.endswith("/")
            & (
                (F.col("__fd_path") == stem)
                | F.col("__fd_path").startswith(
                    F.concat(stem, F.lit("?"))
                )
            )
        )

    hit = F.exists("__pfxs", _pfx_hit)
    return (
        work.join(
            F.broadcast(eff),
            work["__fd_host"] == eff["__rh"],
            "left",
        )
        .withColumn(out_col, F.coalesce(hit, F.lit(False)))
        .drop("__fd_host", "__fd_path", "__rh", "__pfxs")
    )


def filter_disallowed(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "canonical_url",
    max_labels: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked): the two-frame split over
    :func:`mark_disallowed`'s flag — the X33 rule: blocked rows are
    returned, visible, never silently dropped.  Standalone callers get
    the split contract; plan-sensitive compositions (the crawl
    pipeline) consume mark_disallowed directly so the corpus chain
    evaluates once."""
    marked = mark_disallowed(
        df, rules, url_col, out_col="__fd_blocked", max_labels=max_labels
    )
    allowed = marked.filter(~F.col("__fd_blocked")).drop("__fd_blocked")
    blocked = marked.filter(F.col("__fd_blocked")).drop("__fd_blocked")
    return allowed, blocked


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
    resource can never both look new.

    Bloom gate (round 12, VERDICT r11 #3): at crawl scale the seen set
    is 10^10–10^11 keys, and a raw per-batch anti-join shuffles ALL of
    it every micro-batch.  ``write_bloom()`` opts the set into the
    X46 persisted-bitmap gate (the DedupIndex machinery): steady-state
    batches probe the bitmap map-side first — rows the bloom has never
    seen are DEFINITELY new and skip the join entirely — and only the
    ~|dups| + fpp·|batch| maybe-hits resolve exactly, via broadcast
    joins STREAMED OVER the seen scan when they fit (the round-7
    lesson: pruning just the probe side of a sort-merge anti-join
    still shuffles the big side).  Same bloom-before-table write
    ordering as DedupIndex.append: a crash between the bloom write and
    the parquet append leaves extra BITS (false positives, resolved by
    the exact join), never missing bits (false negatives would admit a
    seen URL as new — the one wrong direction).  Results are
    byte-identical with the gate on or off (pinned)."""

    DUPLICATION_IS_CORRECTNESS = False

    def __init__(self, path: str):
        self.path = path.rstrip("/")
        self._resources: list = []

    @property
    def seen_path(self) -> str:
        return f"{self.path}/seen"

    @property
    def bloom_root(self) -> str:
        """Parent dir of the bitmap table — its EXISTENCE is the
        write_bloom opt-in signal (the DedupIndex blooms/ rule), and
        it SURVIVES a torn-table delete or a crashed overwrite, so the
        gate self-heals (rebuild + write-back) instead of silently
        reverting to the full anti-join forever (review r12)."""
        return f"{self.path}/bloom"

    @property
    def bloom_path(self) -> str:
        """The persisted bitmap table itself."""
        return f"{self.path}/bloom/table"

    def release(self) -> None:
        """Unpersist the previous filter_new call's bitmap broadcast
        (unpersist, not destroy — prior results may still reference
        it; review r7 second pass).  Called automatically at the top
        of each gated filter_new; long-running callers may call it
        once the last returned frame has materialized."""
        for r in self._resources:
            try:
                r.unpersist()
            except Exception:  # pragma: no cover - already released
                pass
        self._resources = []

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
        re-adds them, which the anti-join reads absorb).

        If a persisted bloom exists (:meth:`write_bloom`), the batch's
        keys are OR'd in and the bitmap rewritten BEFORE the parquet
        append — a crash in between leaves bloom bits for URLs the
        table never received (false positives, caught by the exact
        join), never table rows missing from the bloom (false
        negatives would re-admit seen URLs).  The OR is idempotent, so
        at-least-once epoch replays are safe.  A bloom that is PRESENT
        but unreadable (torn write) is DELETED here rather than
        skipped (ADVICE r7): skipping would append keys the bitmap
        never receives, and a transiently-unreadable bloom would later
        load STALE with false negatives for exactly this batch."""
        from covid19i2b2_spark.caching import release_local_checkpoint
        from covid19i2b2_spark.operators.bloom import (
            bloom_table_present,
            delete_bloom_table,
            or_into,
            read_bloom_table,
            write_bloom_table,
        )

        spark = urls.sparkSession
        keys = urls.select(
            F.col(url_col).alias("canonical_url")
        ).filter(F.col("canonical_url").isNotNull()).distinct()
        spec = read_bloom_table(spark, self.bloom_path)
        pinned = None
        if spec is not None:
            # the key frame feeds the bloom OR and the parquet append —
            # pin it so the batch dedup runs once (the DedupIndex
            # append discipline)
            keys = keys.localCheckpoint(eager=True)
            pinned = keys
            write_bloom_table(
                spark,
                or_into(spec, keys, "canonical_url"),
                self.bloom_path,
            )
        elif bloom_table_present(spark, self.bloom_path):
            delete_bloom_table(spark, self.bloom_path)  # torn
        keys.write.mode("append").parquet(self.seen_path)
        if pinned is not None:
            release_local_checkpoint(pinned)

    def write_bloom(self, spark, fpp: float = 0.01) -> None:
        """Opt the set into the persisted-bitmap gate: ONE bitmap over
        the distinct canonical URLs (~9.6 bits/key at fpp=0.01 — a
        10^10-key set is ~12 GB of bitmap, so shard-minded deployments
        should raise fpp or gate per partition; the flat form covers
        10^8–10^9 comfortably under the default 256 MiB cap guard).
        Maintained incrementally by :meth:`append`; rebuilt and
        written back by filter_new's health check when over-full
        (fill > 0.6 stops pruning) or torn."""
        from covid19i2b2_spark.operators.bloom import (
            build_bloom,
            write_bloom_table,
        )

        keys = self._read(spark).distinct()
        write_bloom_table(
            spark, build_bloom(keys, "canonical_url", fpp=fpp),
            self.bloom_path,
        )

    def _healthy_bloom(self, spark, fpp: float = 0.01):
        """Persisted bloom if opted in and healthy; over-full (fill >
        0.6) or torn blooms are rebuilt sized to the live set AND
        written back (leaving them would pay the rebuild scan on every
        batch forever — review r7).  None when never opted in."""
        from covid19i2b2_spark.operators.bloom import (
            bloom_table_present,
            build_bloom,
            fill_ratio,
            read_bloom_table,
            write_bloom_table,
        )

        spec = read_bloom_table(spark, self.bloom_path)
        if spec is not None and fill_ratio(spec) <= 0.6:
            return spec
        # opt-in is the ROOT dir, not the table: a torn-table delete
        # (append) or a crashed overwrite leaves the root, so the gate
        # heals here instead of silently degrading to the plain
        # anti-join forever (review r12)
        if spec is None and not bloom_table_present(spark, self.bloom_root):
            return None
        spec = build_bloom(self._read(spark).distinct(), "canonical_url",
                           fpp=fpp)
        write_bloom_table(spark, spec, self.bloom_path)
        return spec

    def filter_new(
        self,
        spark,
        batch: DataFrame,
        url_col: str = "canonical_url",
        bloom_broadcast_bytes: int = 128 << 20,
    ) -> DataFrame:
        """Rows of ``batch`` whose canonical URL the set has never
        seen.  Without a persisted bloom: one anti-join on the
        canonical key (fine while the set is join-sized).  With one
        (:meth:`write_bloom` — VERDICT r11 #3): the batch probes the
        bitmap MAP-SIDE first, so definitely-new rows never touch the
        seen table at all, and only the maybe-hits resolve exactly —
        via broadcast joins streamed over the seen scan when they fit
        ``bloom_broadcast_bytes`` (row-count-estimated at ~150 B per
        URL row), else the plain anti-join on the (now tiny) maybe
        side.  Byte-identical results either way: the bloom has no
        false negatives (append's bloom-before-table ordering), and
        every maybe-hit is decided by the exact join.  Rows with NULL
        keys are new by definition (anti-join semantics), on both
        paths."""
        seen = self._read(spark).withColumnRenamed(
            "canonical_url", url_col
        )
        spec = self._healthy_bloom(spark)
        if spec is None:
            return batch.join(seen, url_col, "left_anti")
        from covid19i2b2_spark.operators.bloom import might_contain

        self.release()  # previous batch's bitmap broadcast
        maybe_col = F.col(url_col).isNotNull() & might_contain(
            spec, url_col, self._resources
        )
        # pin: flagged feeds three consumers (the maybe count, the
        # resolve join, and the definite branch of the union) — persist
        # so the batch plan + probe run once; released with the
        # broadcast on the next call (unpersist works on both)
        flagged = batch.withColumn("__maybe", maybe_col).persist()
        self._resources.append(flagged)
        definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
        maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
        n_maybe = maybe.count()
        if n_maybe == 0:
            return definite
        if n_maybe * 150 <= bloom_broadcast_bytes:
            # the round-7 flip: broadcast the small maybe side OVER the
            # seen scan (semi-join -> tiny hit set), then broadcast the
            # hits back — the corpus-sized seen table never shuffles
            hits = seen.join(
                F.broadcast(maybe.select(url_col).distinct()),
                url_col,
                "left_semi",
            ).distinct()
            resolved = maybe.join(F.broadcast(hits), url_col, "left_anti")
        else:
            resolved = maybe.join(seen, url_col, "left_anti")
        return definite.unionByName(resolved)

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

"""Hypothesis fuzz of the URL canonicalizer (round 10) against a
pure-Python reference implementing the same RFC 3986 §6 syntax rules —
the r08 differential pattern (fuzz the Spark expression chain vs an
independent restatement; any rule drift between the two formulations
fails loudly on a concrete URL)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TRACK = re.compile(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=")


def _norm_ref(u: str) -> tuple[str, str]:
    """(host, url_norm) — independent restatement of normalize_urls."""
    u = re.sub(r"#.*$", "", u)
    scheme_m = re.search(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    scheme = scheme_m.group(1).lower() if scheme_m else ""
    hp_m = re.search(r"://([^/?#]*)", u)
    hostport = re.sub(r"^[^@]*@", "", hp_m.group(1)) if hp_m else ""
    path_m = re.search(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = path_m.group(1) if path_m else ""
    q_m = re.search(r"\?([^#]*)", u)
    query = q_m.group(1) if q_m else ""

    host = re.sub(r"^www\.", "", re.sub(r":[0-9]+$", "", hostport).lower())
    port_m = re.search(r":([0-9]+)$", hostport)
    portnum = port_m.group(1) if port_m else ""
    if path == "" or re.sub(r"/+$", "", path) == "":
        path_n = "/"
    else:
        path_n = re.sub(r"/+$", "", path)
    kept = "&".join(
        sorted(p for p in query.split("&") if p and not _TRACK.match(p))
    )
    port_part = (
        f":{portnum}"
        if portnum
        and not (scheme == "http" and portnum == "80")
        and not (scheme == "https" and portnum == "443")
        else ""
    )
    url_norm = (
        f"{scheme}://{host}{port_part}{path_n}" + (f"?{kept}" if kept else "")
    )
    return host, url_norm


_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=8,
)
_scheme = st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp", "FTP"])
_user = st.sampled_from(["", "user@", "u:pw@", "Weird.Name@"])
_www = st.sampled_from(["", "www.", "WWW.", "wWw."])
_port = st.sampled_from(["", ":80", ":443", ":8080", ":1"])
_pkey = st.one_of(
    _label,
    st.sampled_from(["utm_source", "utm_campaign", "utm_", "fbclid", "gclid",
                     "ref", "refx", "xutm_a"]),
)
_param = st.tuples(_pkey, _label).map(lambda kv: f"{kv[0]}={kv[1]}")
_host = st.one_of(
    st.lists(_label, min_size=1, max_size=3).map(".".join),
    st.sampled_from(["[::1]", "[2001:DB8::1]", "[fe80::a%25eth0]"]),
)
_urls = st.builds(
    lambda scheme, user, www, host, port, segs, slashes, params, frag: (
        f"{scheme}://{user}{www}{host}{port}"
        + ("/" + "/".join(segs) if segs else "")
        + "/" * slashes
        + ("?" + "&".join(params) if params is not None else "")
        + frag
    ),
    _scheme,
    _user,
    _www,
    _host,
    _port,
    st.lists(_label, min_size=0, max_size=3),
    st.integers(min_value=0, max_value=2),
    st.one_of(st.none(), st.lists(_param, min_size=0, max_size=4)),
    st.sampled_from(["", "#f", "#s1/x?y=1"]),
)


@settings(**_SETTINGS)
@given(st.lists(_urls, min_size=1, max_size=20))
def test_normalize_urls_fuzz_vs_python(spark, urls):
    from bigdatawork_spark.operators.curation import normalize_urls

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url_raw string"
    )
    got = {r.doc_id: (r.host, r.url_norm) for r in normalize_urls(df).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _norm_ref(u), (
            f"url={u!r} spark={got[i]} ref={_norm_ref(u)}"
        )


def test_normalize_urls_pinned_cases(spark):
    """Hand-pinned canonical pairs — the rules stated one example each,
    independent of both the fuzz generator and the registry generator."""
    from bigdatawork_spark.operators.curation import normalize_urls

    cases = [
        ("HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&a=1#frag",
         "ex.com", "http://ex.com/a?a=1&b=2"),
        ("https://ex.com:443/", "ex.com", "https://ex.com/"),
        ("https://ex.com:8080/x", "ex.com", "https://ex.com:8080/x"),
        ("ftp://Ex.com:80/x", "ex.com", "ftp://ex.com:80/x"),  # non-http: keep 80
        ("http://ex.com", "ex.com", "http://ex.com/"),
        ("http://ex.com/?utm_a=1&ref=z", "ex.com", "http://ex.com/"),
        ("http://ex.com/a//", "ex.com", "http://ex.com/a"),
        ("http://ex.com/?refx=keep", "ex.com", "http://ex.com/?refx=keep"),
        # userinfo stripped — the blocklist-bypass spelling (ADVICE r10)
        ("http://anything@src3.example.com/", "src3.example.com",
         "http://src3.example.com/"),
        ("http://u:pw@WWW.Ex.com:80/a", "ex.com", "http://ex.com/a"),
        # IPv6 literals: bracket form survives, port rules still apply
        ("https://[2001:DB8::1]:443/x", "[2001:db8::1]",
         "https://[2001:db8::1]/x"),
        ("http://[::1]:8080/", "[::1]", "http://[::1]:8080/"),
        ("http://user@[::1]/y", "[::1]", "http://[::1]/y"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)],
        "doc_id long, url_raw string",
    )
    got = {r.doc_id: (r.host, r.url_norm) for r in normalize_urls(df).collect()}
    for i, (u, host, norm) in enumerate(cases):
        assert got[i] == (host, norm), f"url={u!r} got={got[i]}"


def _contamination_ref(rows, n=8):
    """Pure-Python reference for ngram_contamination: rows of
    (doc_id, source, text) → {source: (n_train, n_contam, n_clean)}."""
    import hashlib

    def split_of(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        return "train" if h < "e666" else ("val" if h < "f333" else "test")

    def grams(text):
        ws = [w for w in text.lower().split(" ") if w]
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench = set()
    for doc_id, _, text in rows:
        if split_of(doc_id) in ("val", "test"):
            bench |= grams(text)
    out = {}
    for doc_id, source, text in rows:
        if split_of(doc_id) != "train":
            continue
        hit = bool(grams(text) & bench)
        t, c, cl = out.get(source, (0, 0, 0))
        out[source] = (t + 1, c + (1 if hit else 0), cl + (0 if hit else 1))
    return out


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000), _doc),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_ngram_contamination_fuzz_vs_python(spark, docs):
    """Tiny 5-word vocabulary + short docs → dense 8-gram collisions
    across random splits; the Spark semi-join plan must agree with the
    set-algebra reference on every per-source count (incl. docs with <8
    words, empty docs, and sources whose train side is empty)."""
    from bigdatawork_spark.operators.training_ops import ngram_contamination

    rows = [(i, f"s{i % 3}", text) for i, text in docs]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: (r.n_train, r.n_contaminated, r.n_clean)
        for r in ngram_contamination(df).collect()
    }
    assert got == _contamination_ref(rows)

"""Property-based canonicalizer tests (pure Python — no Spark session).

Invariants that must hold for ANY input, not just fixtures:
- idempotence: canonicalize(canonicalize(u)) == canonicalize(u)
- output shape: always http(s), lowercase scheme+host, no fragment,
  no leading www., no default port
- never crashes on arbitrary text
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from bodhium_webscrapper_spark.functions.canonicalize import canonicalize_one

_host_label = st.text(string.ascii_letters + string.digits + "-", min_size=1, max_size=8)
_hosts = st.builds(lambda a, b: f"{a}.{b}".lower(), _host_label, _host_label)
_paths = st.text(string.ascii_letters + string.digits + "/._~%-", max_size=30)
_queries = st.text(string.ascii_letters + string.digits + "=&%", max_size=20)
_schemes = st.sampled_from(["http://", "https://", "HTTPS://", "", "HtTp://"])
_wwws = st.sampled_from(["", "www.", "WWW."])
_ports = st.sampled_from(["", ":80", ":443", ":8080"])


@st.composite
def urlish(draw):
    u = draw(_schemes) + draw(_wwws) + draw(_hosts) + draw(_ports) + "/" + draw(_paths)
    if draw(st.booleans()):
        u += "?" + draw(_queries)
    if draw(st.booleans()):
        u += "#frag"
    return u


@settings(max_examples=300, deadline=None)
@given(urlish())
def test_idempotent(u):
    c = canonicalize_one(u)
    if c is not None:
        assert canonicalize_one(c) == c


@settings(max_examples=300, deadline=None)
@given(urlish())
def test_output_shape(u):
    c = canonicalize_one(u)
    if c is None:
        return
    assert c.startswith(("http://", "https://"))
    assert "#" not in c
    scheme, rest = c.split("://", 1)
    hostport = rest.split("/", 1)[0]
    assert not hostport.startswith("www.")
    assert hostport == hostport.lower()
    # default port stripped only for its own scheme
    if scheme == "http":
        assert not hostport.endswith(":80")
    else:
        assert not hostport.endswith(":443")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_never_crashes(s):
    canonicalize_one(s)  # may return None; must not raise


@settings(max_examples=200, deadline=None)
@given(urlish(), st.sampled_from(["a", "../b", "/c", "?x=1", "d/e", ""]))
def test_relative_resolution_never_crashes(base, rel):
    b = canonicalize_one(base)
    if b is not None:
        out = canonicalize_one(rel, b)
        if out is not None:
            assert canonicalize_one(out) == out

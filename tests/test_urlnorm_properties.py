"""Property-based canonicalizer tests (hypothesis): the dedupe key of
the whole engine must be idempotent and total-function-safe."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from nightcrawlercmd_spark.functions.urlnorm import canonicalize, host_of, resolve

_hostchars = st.text(alphabet=string.ascii_letters + string.digits + "-.", min_size=1, max_size=20)
_pathchars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._~%-!$&'()*+,;=:@", max_size=40
)
_querychars = st.text(alphabet=string.ascii_letters + string.digits + "=&_%", max_size=30)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_never_raises_on_arbitrary_input(s):
    out = canonicalize(s)
    assert out is None or out.startswith(("http://", "https://"))


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=_hostchars,
    path=_pathchars,
    query=_querychars,
    frag=st.text(alphabet=string.ascii_letters, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_idempotent(scheme, host, path, query, frag):
    url = f"{scheme}://{host}/{path}"
    if query:
        url += f"?{query}"
    if frag:
        url += f"#{frag}"
    c1 = canonicalize(url)
    if c1 is not None:
        assert canonicalize(c1) == c1
        assert "#" not in c1
        # host component must be already-lowercased and parseable back
        h = host_of(c1)
        assert h == h.lower()


@given(host=_hostchars, path=_pathchars, href=_pathchars)
@settings(max_examples=200, deadline=None)
def test_resolve_output_is_canonical(host, path, href):
    base = canonicalize(f"http://{host}/{path}")
    if base is None:
        return
    child = resolve(base, href)
    if child is not None:
        assert canonicalize(child) == child  # resolution lands in canon space


@given(
    host=_hostchars,
    segs=st.lists(st.sampled_from(["a", "b", "..", ".", "x1"]), max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_dot_segments_never_escape_root(host, segs):
    url = f"http://{host}/" + "/".join(segs)
    c = canonicalize(url)
    if c is not None:
        assert "/../" not in c and not c.endswith("/..")
        assert "/./" not in c

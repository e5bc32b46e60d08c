"""Property-based tests (hypothesis) for the pure-Python kernels.

These pin INVARIANTS rather than examples: the properties that every
input — including adversarial ones a crawl will eventually see — must
satisfy. No SparkSession needed; the kernels under test are the exact
functions the Arrow UDFs map over batches.
"""

from hypothesis import given, settings, example
from hypothesis import strategies as st

from news_combinator_spark.functions.urls import canonicalize_url, url_host

# URL-ish strings: valid shapes plus junk (schemeless, weird ports,
# unicode, empty) — the canonicalizer must never crash and must be
# idempotent on ALL of them.
_hosts = st.from_regex(r"[a-zA-Z0-9.-]{1,20}", fullmatch=True)
_paths = st.from_regex(r"(/[a-zA-Z0-9._~%-]{0,10}){0,4}", fullmatch=True)
_queries = st.from_regex(r"([a-z]{1,3}=[a-z0-9]{0,4}&?){0,4}", fullmatch=True)
_urls = st.one_of(
    st.builds(
        lambda h, p, q, frag, port: (
            f"http://{h}{port}{p}"
            + (f"?{q}" if q else "")
            + (f"#{frag}" if frag else "")
        ),
        _hosts, _paths, _queries,
        st.from_regex(r"[a-z0-9]{0,6}", fullmatch=True),
        st.sampled_from(["", ":80", ":8080", ":443"]),
    ),
    st.text(max_size=40),
)


@settings(max_examples=300, deadline=None)
@given(_urls)
@example(
    url='\x1b\xa00',
).via('discovered failure')
@example(
    url='0 #',
).via('discovered failure')
def test_canonicalize_idempotent(url):
    """canon(canon(x)) == canon(x): the seen-set key is stable no
    matter how many times a URL round-trips through the frontier."""
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(_urls)
def test_canonicalize_never_raises_and_strips_fragment(url):
    out = canonicalize_url(url)
    assert isinstance(out, str)
    if out.startswith("http://"):
        assert "#" not in out


@settings(max_examples=200, deadline=None)
@given(_hosts, _paths)
def test_default_port_and_host_case_fold_to_same_key(host, path):
    """The three spellings of the same resource — mixed-case host,
    explicit default port, bare — must collapse to ONE seen-set key."""
    base = canonicalize_url(f"http://{host.lower()}{path or '/'}")
    assert canonicalize_url(f"http://{host.upper()}{path or '/'}") == base
    assert canonicalize_url(f"http://{host.lower()}:80{path or '/'}") == base


@settings(max_examples=200, deadline=None)
@given(_urls)
def test_url_host_never_raises(url):
    h = url_host(url)
    assert isinstance(h, str)
    assert ":" not in h and "@" not in h


# -- segmentation kernel ----------------------------------------------------

_mixed_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E50),
        st.sampled_from(list("abc XY,。 123")),
    ),
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(_mixed_text)
def test_cjk_bigram_tokenize_loses_no_cjk_chars(text):
    """The fallback tokenizer's CJK bigrams must cover every CJK char
    of the input (no silent drops), and be deterministic."""
    from news_combinator_spark.functions.textfns import tokenize

    toks = tokenize(text)
    assert toks == tokenize(text)
    cjk_in = {c for c in text if 0x4E00 <= ord(c) <= 0x9FFF}
    cjk_out = {c for t in toks for c in t if 0x4E00 <= ord(c) <= 0x9FFF}
    assert cjk_in == cjk_out


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=8), max_size=6))
def test_minhash_signature_deterministic_and_sized(tokens):
    from news_combinator_spark.functions.textfns import minhash_signature

    sig = minhash_signature(tokens, 32)
    assert len(sig) == 32
    assert sig == minhash_signature(tokens, 32)
    # signature depends only on the token SET
    assert sig == minhash_signature(list(reversed(tokens)), 32)

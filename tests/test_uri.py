"""RFC 3986 §5.4 reference resolution matrix (public spec examples).

The reference resolver passes all §5.4 "normal examples"
(/root/reference/README.md:34-36); we require normal + abnormal.
"""

import pytest

from serd_spark.uri import (
    file_uri_parse,
    node_new_file_uri,
    remove_dot_segments,
    uri_is_absolute,
    uri_resolve,
)

BASE = "http://a/b/c/d;p?q"

NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),  # strict parser
]


@pytest.mark.parametrize("ref,expect", NORMAL + ABNORMAL)
def test_rfc3986_resolution(ref, expect):
    assert uri_resolve(ref, BASE) == expect


def test_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_is_absolute():
    assert uri_is_absolute("http://example.org/")
    assert uri_is_absolute("urn:x:y")
    assert not uri_is_absolute("foo/bar")
    assert not uri_is_absolute("/foo")
    assert not uri_is_absolute("#frag")
    assert not uri_is_absolute("1:bad")  # scheme must start with alpha


def test_file_uri_roundtrip():
    # cases from the reference unit matrix (test_uri.c:100-115)
    assert node_new_file_uri("/foo/bar") == "file:///foo/bar"
    assert node_new_file_uri("/foo/bar", "bhost") == "file://bhost/foo/bar"
    assert node_new_file_uri("a/relative path") == "a/relative%20path"
    assert node_new_file_uri("C:/My 100%") == "file:///C:/My%20100%25"

    host, path = file_uri_parse("file://host/path")
    assert (host, path) == ("host", "/path")
    # junk escapes are dropped
    assert file_uri_parse("file:///foo/%0Xbar")[1] == "/foo/bar"
    assert file_uri_parse("file:///foo/%X0bar")[1] == "/foo/bar"


def test_chained_base():
    from serd_spark.env import Env

    env = Env("http://example.org/a/b")
    env.set_base_uri("c/d")
    assert env.base_uri == "http://example.org/a/c/d"
    env.set_base_uri("../e")
    assert env.base_uri == "http://example.org/a/e"

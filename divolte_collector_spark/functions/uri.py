"""URI operators (reference §2.6, UriValueProducer,
DslRecordMapping.java:449-530; multimap in functions/querystring.py).

``parse x to uri`` wraps java.net.URI — invalid input becomes absent
(:449-466). Spark's ``try_parse_url`` family covers every accessor
JVM-side and returns NULL on an unparseable URI instead of raising —
``parse_url`` under ANSI mode THROWS on inputs like a bare ``%`` in
the query string, which would kill the whole batch on one bad URL
(found by the generated-URL property test); decoding uses ``try_url_decode`` so undecodable input is
absent rather than an error, matching the producer's
``Optional``-swallowing behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uri_scheme(uri: Column) -> Column:
    """``uri.scheme()`` (:480)."""
    return F.try_parse_url(uri, F.lit("PROTOCOL"))


def uri_host(uri: Column) -> Column:
    """``uri.host()`` (:486)."""
    return F.try_parse_url(uri, F.lit("HOST"))


def uri_port(uri: Column) -> Column:
    """``uri.port()`` — absent when the URI carries none (= -1 in Java,
    :492). ``parse_url`` has no PORT part; extracted from AUTHORITY."""
    authority = F.try_parse_url(uri, F.lit("AUTHORITY"))
    return F.nullif(
        F.regexp_extract(authority, r":(\d+)$", 1), F.lit("")
    ).try_cast("int")


def uri_raw_path(uri: Column) -> Column:
    """``uri.rawPath()`` (:474)."""
    return F.try_parse_url(uri, F.lit("PATH"))


def uri_path(uri: Column) -> Column:
    """``uri.path()`` — URL-decoded (:468)."""
    return F.try_url_decode(uri_raw_path(uri))


def uri_raw_query(uri: Column) -> Column:
    """``uri.rawQueryString()`` (:504)."""
    return F.try_parse_url(uri, F.lit("QUERY"))


def uri_decoded_query(uri: Column) -> Column:
    """``uri.decodedQueryString()`` (:498)."""
    return F.try_url_decode(uri_raw_query(uri))


def uri_raw_fragment(uri: Column) -> Column:
    """``uri.rawFragment()`` (:516)."""
    return F.try_parse_url(uri, F.lit("REF"))


def uri_decoded_fragment(uri: Column) -> Column:
    """``uri.decodedFragment()`` (:510)."""
    return F.try_url_decode(uri_raw_fragment(uri))

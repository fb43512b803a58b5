"""§2.4 simple-value producers: the named accessors of the mapping DSL
(DslRecordMapping.java:249-330,566), 1:1 with the Groovy surface, each
returning a Column over the normalized decoded-event DataFrame
(sources/browser.py, sources/json_source.py).

These are deliberately thin — the engine's event table IS the value
surface, so each accessor is a column reference (browser-only values
live under the ``browser`` struct; transport values like cookies /
user-agent / remote host survive decode because the decoders keep the
raw request columns). Absent-propagation falls out of SQL null
semantics: a value missing on this event (JSON events have no
``browser`` struct fields, a request without the cookie) is null, and
the DSL's guards (functions/booleans.py) treat null as absent exactly
like the reference's ``Optional.empty()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def location() -> Column:  # :249
    return F.col("browser.location")


def referer() -> Column:  # :253
    return F.col("browser.referer")


def event_type() -> Column:  # :257
    return F.col("event_type")


def first_in_session() -> Column:  # :261
    return F.col("first_in_session")


def corrupt() -> Column:  # :265
    return F.col("corrupt_event")


def duplicate() -> Column:  # :269
    return F.col("duplicate")


def timestamp() -> Column:  # :273 — server receive time, epoch millis
    return F.unix_millis(F.col("request_start_time"))


def client_timestamp() -> Column:  # :277 — client clock, epoch millis
    return F.unix_millis(F.col("client_time"))


def remote_host() -> Column:  # :281
    return F.col("remote_host")


def viewport_pixel_width() -> Column:  # :285
    return F.col("browser.viewport_pixel_width")


def viewport_pixel_height() -> Column:  # :289
    return F.col("browser.viewport_pixel_height")


def screen_pixel_width() -> Column:  # :293
    return F.col("browser.screen_pixel_width")


def screen_pixel_height() -> Column:  # :297
    return F.col("browser.screen_pixel_height")


def device_pixel_ratio() -> Column:  # :301
    return F.col("browser.device_pixel_ratio")


def party_id() -> Column:  # :305
    return F.col("party_id")


def session_id() -> Column:  # :309
    return F.col("session_id")


def page_view_id() -> Column:  # :313
    return F.col("browser.page_view_id")


def event_id() -> Column:  # :317
    return F.col("event_id")


def user_agent_string() -> Column:  # :324
    return F.col("user_agent")


def cookie(name: str) -> Column:  # :566 — request cookie by name
    return F.element_at(F.col("cookies"), name)

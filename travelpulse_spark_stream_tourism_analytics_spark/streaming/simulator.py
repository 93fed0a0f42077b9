"""Deterministic event simulator — producer parity for fixtures.

Preserves the reference producer's distributional semantics
(SURVEY.md §2.10, reference producers/orchestrator_producers.py):
seasonality multiplier (peak-month x1.4, weekend x1.15,
x(1+log1p(pop)/12), :41-51), lead-time mixture (35% exp(mean 5) else
N(30,20) clamped >=1, :34-39), delay N(5,10)+(weather+congestion)*60
and cancel prob 0.01+weather*0.5 (:190-196), ADR
max(30, stars*30+N(0,20)+5s) (:245) — but seeded and in-process, so
streaming tests get identical events every run.
"""

from __future__ import annotations

import json
import math
import os
import random
from datetime import datetime, timedelta

PEAK_MONTHS = (6, 7, 8, 12)

CITIES = [
    {"city_id": "3165524", "city_name": "Roma", "pop": 2873000, "stars": 4},
    {"city_id": "3173435", "city_name": "Milano", "pop": 1366000, "stars": 4},
    {"city_id": "3169070", "city_name": "Napoli", "pop": 972000, "stars": 3},
    {"city_id": "3176959", "city_name": "Firenze", "pop": 382000, "stars": 3},
    {"city_id": "3164600", "city_name": "Venezia", "pop": 261000, "stars": 5},
]
AIRPORTS = ["FCO", "MXP", "NAP", "FLR", "VCE"]


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _seasonality(rng: random.Random, day: datetime, pop: int) -> float:
    s = 1.4 if day.month in PEAK_MONTHS else 1.0
    if day.weekday() >= 5:
        s *= 1.15
    return s * (1 + math.log1p(pop) / 12.0)


def _lead_time(rng: random.Random) -> int:
    if rng.random() < 0.35:
        return max(1, int(rng.expovariate(1 / 5.0)))
    return max(1, int(rng.gauss(30, 20)))


def simulate(
    start: datetime, n_days: int = 3, events_per_day: int = 40, seed: int = 42
) -> dict[str, list[dict]]:
    """Generate weather/flight/booking event payload dicts."""
    rng = random.Random(seed)
    out: dict[str, list[dict]] = {"weather": [], "flight": [], "booking": []}
    for d in range(n_days):
        day = start + timedelta(days=d)
        for city in CITIES:
            # NOTE: s/wf are unused in the weather payload but the
            # rng.gauss draw is DELIBERATE stream padding — removing it
            # would shift the seeded sequence and change every fixture
            # value downstream (baselines depend on it).
            s = _seasonality(rng, day, city["pop"])
            wf = min(1.0, max(0.0, rng.gauss(0.2, 0.15)))
            ts = day + timedelta(minutes=rng.randrange(0, 1440))
            out["weather"].append(
                {
                    "schema_version": "1",
                    "event_type": "weather",
                    "event_ts": _iso(ts),
                    "ingest_ts": _iso(ts + timedelta(seconds=rng.randrange(0, 30))),
                    "trace_id": f"w-{d}-{city['city_id']}",
                    "producer": "sim",
                    "city_id": city["city_id"],
                    "date": day.strftime("%Y-%m-%d"),
                    "t_min": round(rng.gauss(12, 6), 1),
                    "t_max": round(rng.gauss(22, 6), 1),
                    "precip_mm": round(max(0.0, rng.gauss(2, 4)), 1),
                    "wind_kph": round(max(0.0, rng.gauss(12, 6)), 1),
                    "humidity": round(min(100.0, max(0.0, rng.gauss(60, 15))), 1),
                    "condition": rng.choice(["sunny", "cloudy", "rain"]),
                    "is_peak_season": day.month in PEAK_MONTHS,
                    "holiday_flag": False,
                }
            )
        for _ in range(events_per_day):
            city = rng.choice(CITIES)
            s = _seasonality(rng, day, city["pop"])
            wf = min(1.0, max(0.0, rng.gauss(0.2, 0.15)))
            cong = min(1.0, max(0.0, rng.gauss(0.3, 0.2)))
            delay = max(0, int(rng.gauss(5, 10) + (wf + cong) * 60))
            cancelled = rng.random() < (0.01 + wf * 0.5) * 0.2
            ts = day + timedelta(minutes=rng.randrange(0, 1440))
            origin, dest = rng.sample(AIRPORTS, 2)
            out["flight"].append(
                {
                    "schema_version": "1",
                    "event_type": "flight",
                    "event_ts": _iso(ts),
                    "ingest_ts": _iso(ts + timedelta(seconds=rng.randrange(0, 30))),
                    "trace_id": f"f-{d}-{_}",
                    "producer": "sim",
                    "flight_id": f"AZ{d}{_:03d}",
                    "airline": "AZ",
                    "service_date": day.strftime("%Y-%m-%d"),
                    "origin_iata": origin,
                    "destination_iata": dest,
                    "destination_city_id": city["city_id"],
                    "scheduled_departure": _iso(ts),
                    "actual_departure": _iso(ts + timedelta(minutes=delay)),
                    "scheduled_arrival": _iso(ts + timedelta(hours=1)),
                    "actual_arrival": _iso(ts + timedelta(hours=1, minutes=delay)),
                    "status": "cancelled" if cancelled else "landed",
                    "delay_min": None if cancelled else delay,
                    "load_factor": round(min(1.0, max(0.3, rng.gauss(0.8, 0.1))), 2),
                    "aircraft_type": "A320",
                    "seats": 180,
                    "weather_factor": round(wf, 3),
                    "airport_congestion": round(cong, 3),
                }
            )
            lead = _lead_time(rng)
            nights = max(1, int(rng.gauss(3, 2)))
            adr = round(max(30.0, city["stars"] * 30 + rng.gauss(0, 20) + 5 * s), 2)
            bts = day + timedelta(minutes=rng.randrange(0, 1440))
            out["booking"].append(
                {
                    "schema_version": "1",
                    "event_type": "booking",
                    "event_ts": _iso(bts),
                    "ingest_ts": _iso(bts + timedelta(seconds=rng.randrange(0, 30))),
                    "trace_id": f"b-{d}-{_}",
                    "producer": "sim",
                    "booking_id": f"B{d}{_:04d}",
                    "hotel_id": f"H{city['city_id']}-{rng.randrange(10)}",
                    "city_id": city["city_id"],
                    "city_name": city["city_name"],
                    "checkin_date": (day + timedelta(days=lead)).strftime("%Y-%m-%d"),
                    "checkout_date": (day + timedelta(days=lead + nights)).strftime(
                        "%Y-%m-%d"
                    ),
                    "nights": nights,
                    "guests": rng.randrange(1, 5),
                    "rooms": rng.randrange(1, 3),
                    "channel": rng.choice(["ota", "direct", "agency"]),
                    "lead_time_days": lead,
                    "adr_proxy": adr,
                    "currency": "EUR",
                    "is_refundable": rng.random() < 0.7,
                    "status": "confirmed" if rng.random() > 0.005 else "cancelled",
                    "cancel_ts": None,
                    "flight_anchor": {"delay_min": delay},
                }
            )
    return out


def write_wire_fixture(events: list[dict], path: str, kafka_skew_s: int = 5) -> None:
    """Serialize payloads to wire JSONL: {key, value, kafka_ts}, with
    kafka_ts = ingest_ts + skew (broker append lag)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for ev in events:
            ing = datetime.strptime(ev["ingest_ts"], "%Y-%m-%dT%H:%M:%SZ")
            kafka_ts = ing + timedelta(seconds=kafka_skew_s)
            key = ev.get("city_id") or ev.get("flight_id") or ev.get("trace_id")
            f.write(
                json.dumps(
                    {
                        "key": key,
                        "value": json.dumps(ev),
                        "kafka_ts": kafka_ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                    }
                )
                + "\n"
            )


def timewarp_clock(sim_start: datetime, warp: float):
    """Accelerated simulated clock (reference
    producers/orchestrator_producers.py:349-366): wall-clock elapsed
    seconds map to ``sim_start + elapsed*warp``. This is what lets
    365-day event-time windows close in minutes of wall time
    (SURVEY.md §1.4) — returns a callable wall_dt -> sim_dt."""

    def to_sim(wall_now: datetime, wall_start: datetime) -> datetime:
        elapsed = (wall_now - wall_start).total_seconds()
        return sim_start + timedelta(seconds=elapsed * warp)

    return to_sim

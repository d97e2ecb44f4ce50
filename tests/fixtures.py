"""Deterministic NGSI notification fixtures (FIXTURES.md §A).

Replicates the reference's manual test harness — infinite curl loops
POSTing randomized payloads at 1 Hz
(/root/reference/files/example1/curl_Notification.sh:1-29, example5:1-50)
— with a fixed seed and explicit timestamps so golden tests are exact.
"""

from __future__ import annotations

import datetime as dt
import json
import random

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def flat_payload(temperature: float, pressure: float, entity_id: str = "R1") -> str:
    """files/example1/curl_Notification.sh:12-25 (1 entity x 6 float attrs)."""
    attrs = {
        "co": 0.0,
        "co2": 0.0,
        "humidity": 40.0,
        "pressure": pressure,
        "temperature": temperature,
        "wind_speed": 1.06,
    }
    entity = {"id": entity_id, "type": "Node"}
    for k, v in attrs.items():
        entity[k] = {"type": "Float", "value": v, "metadata": {}}
    return json.dumps({"data": [entity], "subscriptionId": "57458eb60962ef754e7c0998"})


def bus_payload(price1: int, price2: int) -> str:
    """files/example5/curl_Notification.sh:12-46 (nested buses attr)."""
    value = {
        "buses": [
            {
                "name": "BusCompany1",
                "schedule": {"morning": [7, 9, 11], "afternoon": [13, 15, 17, 19], "night": [23, 1, 5]},
                "price": price1,
            },
            {
                "name": "BusCompany2",
                "schedule": {"morning": [8, 10, 12], "afternoon": [16, 20], "night": [23]},
                "price": price2,
            },
        ]
    }
    entity = {
        "id": "R1",
        "type": "Node",
        "information": {"type": "object", "value": value, "metadata": {}},
    }
    return json.dumps({"data": [entity], "subscriptionId": "57458eb60962ef754e7c0998"})


def flat_sequence(n: int = 30, seed: int = 42):
    """1 Hz sequence of (ts, payload, temperature): temp ∈ [18,53],
    pressure ∈ [1,3113] (curl_Notification.sh:3-4)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        temp = float(rng.randint(18, 53))
        pres = float(rng.randint(1, 3113))
        out.append((T0 + dt.timedelta(seconds=i), flat_payload(temp, pres), temp))
    return out


def bus_sequence(n: int = 30, seed: int = 7):
    """1 Hz sequence of (ts, payload, price1, price2): prices ∈ [10,53]/[10,44]
    (files/example5/curl_Notification.sh:3-4)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        p1, p2 = rng.randint(10, 53), rng.randint(10, 44)
        out.append((T0 + dt.timedelta(seconds=i), bus_payload(p1, p2), p1, p2))
    return out


def expected_sliding_windows(rows, size_s: int = 5, slide_s: int = 2):
    """Independent Python oracle for epoch-aligned sliding windows:
    rows = [(ts: datetime, key, value)] -> {(window_start_epoch, key): [values]}."""
    out: dict[tuple[int, str], list] = {}
    for ts, key, value in rows:
        t_us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        k = 0
        while True:
            ws_us = (t_us // (slide_s * 1_000_000)) * slide_s * 1_000_000 - k * slide_s * 1_000_000
            if ws_us + size_s * 1_000_000 <= t_us:
                break
            out.setdefault((ws_us // 1_000_000, key), []).append(value)
            k += 1
    return out

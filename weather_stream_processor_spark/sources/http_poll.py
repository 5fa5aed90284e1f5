"""HTTP polling ingestion adapter (SURVEY §2.1 S1, rebuilt).

The reference's producer (`/root/reference/weather_stream.py`) polls the
OpenWeatherMap One Call API per location every 60 s, reduces the per-minute
forecast array to one scalar, and publishes JSON to Kafka. Spark has no
HTTP source, and SURVEY §2.1 keeps it that way: ingestion is an adapter
*outside* the query engine that lands messages on a spool the engine can
stream (Kafka in production, a JSON-lines spool directory for tests —
`spark.readStream.schema(...).json(spool_dir)` is the file-source twin).

The transform itself (array reduce, default handling, rounding, event-time
stamping — T6/T7/T8/T9/A1) is a pure function here so it is unit-testable
with no network; the poll loop is a thin shell around it using only the
standard library.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from collections.abc import Callable, Iterable

# weather_stream.py:26 — the reference's poll cadence
CALL_INTERVAL_S = 60


def build_url(lat: float, lon: float, api_key: str) -> str:
    """One Call 3.0 URL, minutely-only, metric (weather_stream.py:29-30)."""
    return (
        "https://api.openweathermap.org/data/3.0/onecall"
        f"?lat={lat}&lon={lon}&exclude=hourly,daily,current"
        f"&units=metric&appid={api_key}"
    )


def reduce_minutely(payload: dict, lat: float, lon: float) -> dict | None:
    """The producer's transform (weather_stream.py:124-138), pure.

    minutely[] -> sum of per-minute precipitation (missing key counts 0,
    :127), rounded to 5 decimals (:126-128), event time = dt of the first
    entry (:129). Returns the wire message dict, or None when the response
    carries no minutely data (the reference skips the publish, :124).
    """
    minutely = payload.get("minutely")
    if not minutely:
        return None
    total = round(sum(m.get("precipitation", 0) for m in minutely), 5)
    return {
        "timestamp": int(minutely[0]["dt"]),
        "total_precipitation": float(total),
        "location": {"lat": float(lat), "lon": float(lon)},
    }


def fetch_json(url: str, timeout_s: float = 30.0) -> dict:
    """GET a JSON document (stdlib only; the poll loop's network seam)."""
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def spool_writer(spool_dir: str) -> Callable[[dict], None]:
    """Append each message as its own JSON file in the spool directory.

    One file per message keeps the FileStreamSource contract (files are
    immutable once visible); writers create temp names and rename, so a
    concurrent reader never sees a partial file.
    """
    os.makedirs(spool_dir, exist_ok=True)
    seq = iter(range(10**12))

    def write(message: dict) -> None:
        name = f"msg-{time.time_ns()}-{next(seq)}.json"
        tmp = os.path.join(spool_dir, f".{name}.tmp")
        final = os.path.join(spool_dir, name)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(message, f)
        os.replace(tmp, final)

    return write


def poll_forever(
    locations: Iterable[tuple[float, float]],
    api_key: str,
    emit: Callable[[dict], None],
    fetch: Callable[[str], dict] = fetch_json,
    interval_s: float = CALL_INTERVAL_S,
    max_cycles: int | None = None,
) -> int:
    """The reference's poll loop (weather_stream.py:154-161): per cycle,
    fetch each location, transform, emit; sleep the interval. ``fetch`` and
    ``emit`` are injectable for tests; ``max_cycles`` bounds the loop (None
    = run forever like the reference). Returns messages emitted.
    """
    emitted = 0
    cycles = 0
    while max_cycles is None or cycles < max_cycles:
        for lat, lon in locations:
            msg = reduce_minutely(fetch(build_url(lat, lon, api_key)), lat, lon)
            if msg is not None:
                emit(msg)
                emitted += 1
        cycles += 1
        if max_cycles is None or cycles < max_cycles:
            time.sleep(interval_s)
    return emitted

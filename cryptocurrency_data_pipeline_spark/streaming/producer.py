"""Test-harness producer: the reference's Lambda producer semantics
(streaming/producer.py) writing JSON-lines files into a watched directory —
each file is one "put_records" batch for the file-source stream.

Reproduces the reference's fixture pattern exactly: N normal ticks plus the
three injected anomalies (producer.py:33-76) — tiny-cap (bad), crashed
(bad), surge (good + alert) — so a batch of 8+3 routes 9/2/1
(FIXTURES.md §3).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone


def make_tick(
    coin_id: str,
    price: float,
    market_cap: int,
    change_24h: float = 0.0,
    pct_24h: float = 0.0,
    ts: datetime | None = None,
) -> dict:
    """One producer record (streaming/producer.py:19-28 field set)."""
    ts = ts or datetime.now(timezone.utc)
    return {
        "coin_id": coin_id,
        "symbol": coin_id[:4],
        "name": coin_id.title(),
        "current_price": price,
        "market_cap": market_cap,
        "price_change_24h": change_24h,
        "price_change_percentage_24h": pct_24h,
        "timestamp": ts.isoformat(),
    }


def make_batch(n_normal: int = 8, ts: datetime | None = None) -> list[dict]:
    """n normal ticks + the reference's 3 injected anomalies."""
    ts = ts or datetime.now(timezone.utc)
    normal = [
        make_tick(f"coin-{i}", 100.0 + i, 5_000_000_000, 1.0, 2.0, ts)
        for i in range(n_normal)
    ]
    anomalies = [
        # market_cap 5e5 < 1e6 → bad (producer.py:33-46)
        make_tick("tiny-cap-coin", 5.0, 500_000, 0.0, 0.0, ts),
        # pct −18.5 < −15 → bad (producer.py:48-61)
        make_tick("crashed-coin", 50.0, 5_000_000, -12.0, -18.5, ts),
        # pct +25 > 10 → good + alert (producer.py:63-76)
        make_tick("surge-coin", 75.0, 8_000_000, 15.0, 25.0, ts),
    ]
    return normal + anomalies


def write_batch(
    source_dir: str,
    records: list[dict],
    corrupt_lines: int = 0,
    base64_encode: bool = False,
) -> str:
    """Append one JSON-lines batch file (≈ one Kinesis put_records call);
    optional corrupt lines exercise the parse-error DLQ path
    (consumer.py:94-102); ``base64_encode`` mirrors Kinesis record
    encoding (consumer.py:37)."""
    import base64

    os.makedirs(source_dir, exist_ok=True)
    path = os.path.join(source_dir, f"batch_{uuid.uuid4().hex}.json")
    lines = [json.dumps(r) for r in records]
    lines += ["{not valid json" for _ in range(corrupt_lines)]
    if base64_encode:
        lines = [base64.b64encode(ln.encode()).decode() for ln in lines]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path

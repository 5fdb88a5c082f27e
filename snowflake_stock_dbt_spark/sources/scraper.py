"""Driver-side ingest of the Yahoo "Most Actives" screener feed.

Re-expression of the reference scraper (scraper/scrape.py): paginated HTTP
source (S1), dedup-by-symbol accumulation loop (S2), CSV/JSON sinks (S3/S4)
and the hard validation gate. This is deliberately driver-side plain Python —
a 100-row snapshot does not need a cluster; Spark ingestion starts at the
landing directory (sources/csv_bronze.py).

Network access is injectable (``fetch_fn``) so tests and offline
environments use a deterministic synthetic feed; the HTTP path uses only
stdlib urllib with the reference's retry budget (≤4 attempts, exponential
backoff, Retry-After honored on 429 — scraper/scrape.py:25-78).
"""

from __future__ import annotations

import csv
import json
import math
import time
import urllib.parse
import urllib.request
from collections.abc import Callable
from datetime import datetime, timezone

SCREENER_URL = "https://query1.finance.yahoo.com/v1/finance/screener/predefined/saved"
PAGE_SIZE = 25
TARGET_ROW_COUNT = 100
MAX_PAGES = 20
MAX_EMPTY_PAGES = 2
MAX_ATTEMPTS = 4
HTTP_TIMEOUT_S = 30.0

FIELDNAMES = [
    "symbol",
    "entity_name",
    "category",
    "location",
    "exchange",
    "currency",
    "price",
    "market_cap",
    "volume",
    "avg_volume_3m",
    "source_url",
    "scraped_at",
]


def _to_float(v) -> float | None:
    """Finite-float coercion (reference scraper/scrape.py:81-90): NaN/Inf and
    unparseable values become None."""
    if v is None:
        return None
    try:
        f = float(v)
    except (TypeError, ValueError):
        return None
    return f if math.isfinite(f) else None


def _to_int(v) -> int | None:
    f = _to_float(v)
    return int(f) if f is not None else None


def normalize_quote(quote: dict, scraped_at: str) -> dict:
    """Raw screener quote -> flat row with fallback coalescing
    (reference scraper/scrape.py:102-120, F22)."""
    symbol = (quote.get("symbol") or "").strip()
    return {
        "symbol": symbol,
        "entity_name": quote.get("longName") or quote.get("shortName") or symbol,
        "category": quote.get("typeDisp") or quote.get("quoteType") or "Unknown",
        "location": quote.get("region") or "Unknown",
        "exchange": quote.get("fullExchangeName") or quote.get("exchange"),
        "currency": quote.get("currency"),
        "price": _to_float(quote.get("regularMarketPrice")),
        "market_cap": _to_int(quote.get("marketCap")),
        "volume": _to_int(quote.get("regularMarketVolume")),
        "avg_volume_3m": _to_int(quote.get("averageDailyVolume3Month")),
        "source_url": SCREENER_URL,
        "scraped_at": scraped_at,
    }


def synthetic_feed(
    n_symbols: int = TARGET_ROW_COUNT,
) -> Callable[[int, int], list[dict]]:
    """Deterministic offline screener feed — the engine's stand-in for the
    reference's offline snapshot (app/streamlit_app.py:275-284 falls back to
    a bundled CSV; here the fallback is a reproducible generator so the whole
    pipeline runs with zero network)."""

    def fetch(start: int, count: int) -> list[dict]:
        quotes = []
        for i in range(start, min(start + count, n_symbols)):
            quotes.append(
                {
                    "symbol": f"SYM{i:04d}",
                    "longName": f"Synthetic Corp {i}",
                    "typeDisp": "EQUITY" if i % 3 else "ETF",
                    "region": ["US", "GB", "DE"][i % 3],
                    "fullExchangeName": "NasdaqGS" if i % 2 else "NYSE",
                    "currency": "USD",
                    "regularMarketPrice": 10.0 + i * 0.25,
                    "marketCap": int(1e9 + i * 5e8),
                    "regularMarketVolume": 1_000_000 + i * 10_000,
                    "averageDailyVolume3Month": 900_000 + i * 9_000,
                }
            )
        return quotes

    return fetch


def fetch_page_http(start: int, count: int = PAGE_SIZE) -> list[dict]:
    """One screener page over HTTP with the reference's retry budget."""
    params = urllib.parse.urlencode(
        {"scrIds": "most_actives", "start": start, "count": count}
    )
    url = f"{SCREENER_URL}?{params}"
    last_err: Exception | None = None
    for attempt in range(MAX_ATTEMPTS):
        try:
            req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
            with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_S) as resp:
                payload = json.load(resp)
            results = payload.get("finance", {}).get("result", [])
            return results[0].get("quotes", []) if results else []
        except urllib.error.HTTPError as e:
            last_err = e
            if e.code == 429 and e.headers.get("Retry-After"):
                time.sleep(float(e.headers["Retry-After"]))
                continue
            if e.code in (429, 500, 502, 503, 504):
                time.sleep(1.5 * (2**attempt))
                continue
            raise
        except (urllib.error.URLError, TimeoutError) as e:
            last_err = e
            time.sleep(1.5 * (2**attempt))
    raise RuntimeError(f"screener fetch failed after {MAX_ATTEMPTS} attempts: {last_err}")


def collect_most_actives(
    fetch_fn: Callable[[int, int], list[dict]] = fetch_page_http,
    target: int = TARGET_ROW_COUNT,
) -> list[dict]:
    """Page until ``target`` unique symbols, 2 consecutive empty pages, or the
    page cap (reference scraper/scrape.py:123-151)."""
    scraped_at = datetime.now(timezone.utc).isoformat()
    rows: dict[str, dict] = {}
    empty_streak = 0
    for page in range(MAX_PAGES):
        quotes = fetch_fn(page * PAGE_SIZE, PAGE_SIZE)
        if not quotes:
            empty_streak += 1
            if empty_streak >= MAX_EMPTY_PAGES:
                break
            continue
        empty_streak = 0
        for q in quotes:
            row = normalize_quote(q, scraped_at)
            if row["symbol"] and row["symbol"] not in rows:
                rows[row["symbol"]] = row
        if len(rows) >= target:
            break
    return list(rows.values())[:target]


def validate_output(rows: list[dict], expected: int = TARGET_ROW_COUNT) -> None:
    """The reference's hard gate (scraper/scrape.py:154-181): exact row count,
    required columns present, ≥90% numeric coverage."""
    if len(rows) != expected:
        raise ValueError(f"expected {expected} rows, got {len(rows)}")
    for row in rows:
        missing = [c for c in FIELDNAMES if c not in row]
        if missing:
            raise ValueError(f"row missing columns: {missing}")
    for col in ("price", "market_cap", "volume"):
        non_null = sum(1 for r in rows if r.get(col) is not None)
        if non_null / len(rows) < 0.9:
            raise ValueError(
                f"numeric coverage for {col}: {non_null}/{len(rows)} < 90%"
            )


def write_outputs(rows: list[dict], csv_path: str, json_path: str | None = None) -> None:
    """CSV (header, UTF-8) + optional JSON sinks (reference :183-197)."""
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=FIELDNAMES)
        writer.writeheader()
        writer.writerows(rows)
    if json_path:
        with open(json_path, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2, default=str)

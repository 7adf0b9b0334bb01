"""Connector protocol surface (io/connector.py): spec / check /
discover / read + the CDK-style retry policy, all offline.

Pins the reference contract: spec's required set matches spec.yaml,
read yields the whole payload as ONE record per stream per run_date
(source.py:72-80), 429/5xx retry with exponential backoff, 4xx fail
fast.
"""

from __future__ import annotations

import json

import pytest

from bc_proj3_spark.io import sources
from bc_proj3_spark.io.connector import (
    RetryPolicy,
    Source,
    StreamDef,
    TransportError,
    fetch_with_retry,
    scholar_source,
)

CONFIG = {
    "engine": "google_scholar",
    "q": "climate+change+technology",
    "as_ylo": "2022",
    "scisbd": "2",
    "hl": "en",
    "num": "20",
    "api_key": "k",
}


def test_spec_required_set_matches_reference():
    spec = scholar_source().spec()
    cs = spec["connectionSpecification"]
    assert set(cs["required"]) == {
        "engine", "q", "as_ylo", "scisbd", "hl", "num", "api_key"
    }
    assert cs["$schema"].endswith("draft-07/schema#")


def test_check_validates_config():
    src = scholar_source()
    assert src.check(CONFIG) == (True, None)
    ok, reason = src.check({k: v for k, v in CONFIG.items() if k != "api_key"})
    assert not ok and "api_key" in reason
    ok, reason = src.check({**CONFIG, "num": 20})
    assert not ok and "num" in reason


def test_discover_lists_full_refresh_stream():
    cat = scholar_source().discover()
    (stream,) = cat["streams"]
    assert stream["name"] == "google_scholar"
    assert stream["supported_sync_modes"] == ["full_refresh"]
    assert "organic_results" in stream["json_schema"]["properties"]


def test_read_whole_payload_is_one_record():
    msgs = list(scholar_source().read(CONFIG, "20230401"))
    assert len(msgs) == 1  # parse_response returns [response.json()]
    (msg,) = msgs
    assert msg["type"] == "RECORD"
    assert msg["record"]["stream"] == "google_scholar"
    assert msg["record"]["data"] == sources.scholar_transport("20230401")
    assert msg["record"]["emitted_at"] == 0  # injected, deterministic


def test_read_rejects_invalid_config():
    with pytest.raises(ValueError, match="missing required"):
        list(scholar_source().read({}, "20230401"))


def test_retry_429_then_success_with_backoff_schedule():
    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        return (429, None) if calls["n"] < 3 else (200, {"ok": True})

    slept: list[float] = []
    out = fetch_with_retry(fetch, RetryPolicy(backoff_base=5.0), slept.append)
    assert out == {"ok": True}
    assert calls["n"] == 3
    assert slept == [5.0, 10.0]  # base * 2**attempt


def test_retry_5xx_exhaustion_raises():
    policy = RetryPolicy(max_retries=2, backoff_base=1.0)
    slept: list[float] = []
    with pytest.raises(TransportError) as ei:
        fetch_with_retry(lambda: (503, None), policy, slept.append)
    assert ei.value.status == 503
    assert ei.value.attempts == 3  # initial + 2 retries
    assert slept == [1.0, 2.0]


def test_4xx_fails_fast_no_retry():
    slept: list[float] = []
    with pytest.raises(TransportError) as ei:
        fetch_with_retry(lambda: (401, None), RetryPolicy(), slept.append)
    assert ei.value.attempts == 1
    assert slept == []


def test_backoff_capped():
    p = RetryPolicy(backoff_base=100.0, backoff_cap=300.0)
    assert p.backoff_time(0) == 100.0
    assert p.backoff_time(5) == 300.0


def test_land_records_airbyte_envelope(tmp_path):
    from bc_proj3_spark.io.connector import land_records

    out = tmp_path / "x.jsonl"
    n = land_records(scholar_source(), CONFIG, "20230401", str(out))
    assert n == 1
    line = json.loads(out.read_text().splitlines()[0])
    assert "organic_results" in line["_airbyte_data"]


def test_multi_stream_source_reads_all():
    src = Source(
        streams=[
            StreamDef("arxiv", {"type": "object"}, sources.arxiv_transport),
            StreamDef(
                "nyt",
                {"type": "object"},
                sources.nyt_transport,
                parse=lambda p: p["docs"],  # per-article records
            ),
        ]
    )
    msgs = list(src.read({}, "20230402"))
    by_stream: dict[str, int] = {}
    for m in msgs:
        by_stream[m["record"]["stream"]] = by_stream.get(m["record"]["stream"], 0) + 1
    assert by_stream == {"arxiv": 1, "nyt": 5}

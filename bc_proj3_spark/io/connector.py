"""Airbyte-protocol-style connector surface over injectable transports.

The reference's extract layer is an Airbyte custom connector
(airbyte/source-google-scholar/source_google_scholar/source.py:17-90):
``spec.yaml`` declares the config contract (seven required string
fields), ``check_connection`` validates a config, ``streams()`` lists
one full-refresh HttpStream whose ``parse_response`` yields the whole
JSON payload as a single record (source.py:72-80), no pagination
(``next_page_token`` → None, source.py:35-39), and the airbyte-cdk's
HttpStream transparently retries HTTP 429 and 5xx with exponential
backoff. The NYT side drives a hosted Airbyte connection by PATCHing
its config per run date and triggering a manual sync
(airflow/dags/function/etl.py:10-41).

This module reproduces that protocol surface engine-side and OFFLINE:
the four connector verbs (spec / check / discover / read) over the same
injectable ``transport`` seam io/sources.py uses, plus the retry policy
as a pure, clock-injectable function — so the contract is testable in a
no-network sandbox and a real HTTP client can slot into the transport
without touching callers.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from bc_proj3_spark.io import sources

# ---------------------------------------------------------------------------
# retry policy (the CDK behavior the reference inherits from HttpStream)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RetryPolicy:
    """Retry HTTP 429 (rate limit) and any 5xx, exponential backoff.

    Mirrors airbyte-cdk's HttpStream defaults the reference relies on
    (its connector overrides neither ``should_retry`` nor
    ``backoff_time``): transient statuses are retried up to
    ``max_retries`` times with ``base * 2**attempt`` seconds between
    attempts, capped; anything else fails fast.
    """

    max_retries: int = 5
    backoff_base: float = 5.0
    backoff_cap: float = 600.0

    def should_retry(self, status: int) -> bool:
        return status == 429 or 500 <= status < 600

    def backoff_time(self, attempt: int) -> float:
        return min(self.backoff_base * (2**attempt), self.backoff_cap)


class TransportError(Exception):
    def __init__(self, status: int, attempts: int):
        self.status = status
        self.attempts = attempts
        super().__init__(f"transport failed with HTTP {status} after {attempts} attempt(s)")


def fetch_with_retry(
    fetch: Callable[[], tuple[int, dict | None]],
    policy: RetryPolicy = RetryPolicy(),
    sleep: Callable[[float], None] = None,
) -> dict:
    """Run ``fetch`` (→ (http_status, payload)) under the retry policy.

    ``sleep`` is injectable so tests assert the backoff schedule without
    waiting on a wall clock; None selects ``time.sleep``.
    """
    if sleep is None:  # pragma: no cover - exercised via injection
        import time

        sleep = time.sleep
    attempt = 0
    while True:
        status, payload = fetch()
        if 200 <= status < 300:
            return payload if payload is not None else {}
        if not policy.should_retry(status) or attempt >= policy.max_retries:
            raise TransportError(status, attempt + 1)
        sleep(policy.backoff_time(attempt))
        attempt += 1


# ---------------------------------------------------------------------------
# streams + source (the four connector verbs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StreamDef:
    """A full-refresh stream: a name, a record JSON schema, and the
    transport that produces one payload per run_date."""

    name: str
    json_schema: dict
    transport: sources.Transport
    #: how one transport payload becomes record dicts; the reference's
    #: parse_response returns the WHOLE payload as a single record
    #: (source.py:72-80) — that's the default here too.
    parse: Callable[[dict], list[dict]] = field(default=lambda payload: [payload])

    def read_records(self, run_date: str) -> list[dict]:
        return self.parse(self.transport(run_date))


#: Config contract of the reference's spec.yaml (same required set).
_SCHOLAR_PROPERTIES = {
    "engine": {"type": "string", "default": "google_scholar"},
    "q": {"type": "string", "default": "climate+change+technology"},
    "as_ylo": {"type": "string", "default": "2022"},
    "scisbd": {"type": "string", "default": "2"},
    "hl": {"type": "string", "default": "en"},
    "num": {"type": "string", "default": "20"},
    "api_key": {"type": "string"},
}


class Source:
    """Airbyte-protocol verbs over a set of :class:`StreamDef`.

    spec/check/discover/read — the surface a platform (or our runner)
    drives. ``read`` emits AirbyteMessage-shaped dicts so the landing
    writer and tests can consume a standard envelope.
    """

    def __init__(
        self,
        streams: list[StreamDef],
        required_config: tuple[str, ...] = (),
        properties: dict | None = None,
    ):
        self._streams = {s.name: s for s in streams}
        self._required = required_config
        self._properties = properties or {}

    # -- spec -------------------------------------------------------------

    def spec(self) -> dict:
        return {
            "documentationUrl": "https://example.invalid/docs",
            "connectionSpecification": {
                "$schema": "http://json-schema.org/draft-07/schema#",
                "type": "object",
                "required": list(self._required),
                "properties": self._properties,
            },
        }

    # -- check ------------------------------------------------------------

    def check(self, config: dict) -> tuple[bool, str | None]:
        """Validate a config against the spec: required fields present,
        declared-string fields actually strings. (The reference's
        check_connection returns (True, None) unconditionally,
        source.py:85-86 — config validation is what the platform layer
        adds around it; we fold it in here.)"""
        for name in self._required:
            if name not in config:
                return False, f"missing required config field {name!r}"
        for name, schema in self._properties.items():
            if name in config and schema.get("type") == "string":
                if not isinstance(config[name], str):
                    return False, f"config field {name!r} must be a string"
        return True, None

    # -- discover ---------------------------------------------------------

    def discover(self) -> dict:
        return {
            "streams": [
                {
                    "name": s.name,
                    "json_schema": s.json_schema,
                    "supported_sync_modes": ["full_refresh"],
                }
                for s in self._streams.values()
            ]
        }

    # -- read -------------------------------------------------------------

    def read(
        self, config: dict, run_date: str, emitted_at: int = 0
    ) -> Iterator[dict]:
        """Emit AirbyteMessage-shaped RECORD dicts for every stream.

        ``emitted_at`` is injected (not wall clock) so reads are
        deterministic; a live deployment passes epoch-millis."""
        ok, reason = self.check(config)
        if not ok:
            raise ValueError(f"invalid config: {reason}")
        for s in self._streams.values():
            for data in s.read_records(run_date):
                yield {
                    "type": "RECORD",
                    "record": {
                        "stream": s.name,
                        "data": data,
                        "emitted_at": emitted_at,
                    },
                }


def scholar_source(transport: sources.Transport = sources.scholar_transport) -> Source:
    """The reference connector's shape: one full-refresh stream named
    google_scholar whose record is the whole SerpApi payload."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "type": "object",
        "properties": {
            "organic_results": {"type": ["array", "null"]},
            "search_metadata": {"type": ["object", "null"]},
        },
    }
    return Source(
        streams=[StreamDef("google_scholar", schema, transport)],
        required_config=tuple(_SCHOLAR_PROPERTIES),
        properties=_SCHOLAR_PROPERTIES,
    )


def land_records(source: Source, config: dict, run_date: str, path: str) -> int:
    """Drain ``source.read`` into an _airbyte_data-enveloped JSONL file —
    the landing shape bronze reads (bronze_google_scholar.py:60). Returns
    records written."""
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        for msg in source.read(config, run_date):
            fh.write(json.dumps({"_airbyte_data": msg["record"]["data"]}) + "\n")
            n += 1
    return n

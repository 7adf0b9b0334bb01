"""Source fetchers: land one batch file per source per run date.

The reference's extract layer is three HTTP sources — SerpApi Google
Scholar via an Airbyte connector (source.py:17-80), the arXiv Atom API
via urllib+xmltodict (etl.py:44-72), and the NYT Archive API via a
reconfigured Airbyte sync (etl.py:10-41) — all landing JSONL in object
storage (etl.py:75-97). This module reproduces that contract
offline-first: each fetcher takes an injectable ``transport`` callable
(the seam where a real HTTP client goes) and writes the same landing
shapes FIXTURES.md documents, named ``<date>_<epoch>_<source>.jsonl``
so io/landing.py's discovery semantics apply unchanged.

The default transports synthesize deterministic payloads from
(run_date, source) — no network, reproducible tests. Payload content is
arbitrary; the *shape* (envelopes, nesting, the "N days ago" snippet
variants) is what downstream bronze/silver must handle.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from bc_proj3_spark.io.landing import format_run_date

Transport = Callable[[str], dict]

_TOPICS = (
    "solar energy storage",
    "lithium ion battery efficiency",
    "carbon abatement technology",
    "photovoltaic innovation",
    "renewable biofuel quality",
)


def _iso(run_date: str) -> str:
    return format_run_date(run_date, "-")


# ---------------------------------------------------------------------------
# default (offline) transports — deterministic payload per run_date
# ---------------------------------------------------------------------------


def arxiv_transport(run_date: str) -> dict:
    """Atom-as-JSON payload: feed.entry array (FIXTURES.md §1)."""
    day = int(run_date[6:])
    entries = []
    for i in range(6):
        # ids overlap across consecutive days; version bumps on the
        # overlap rows exercise the merge's update-if-newer branch.
        art = 2300 + (day * 3 + i)
        version = 1 + (day + i) % 3
        entries.append(
            {
                "id": f"http://arxiv.org/abs/{art}.01v{version}",
                "updated": f"{_iso(run_date)}T0{i}:30:00Z",
                "title": f"Advances in {_TOPICS[i % len(_TOPICS)]}",
                "summary": f"We study {_TOPICS[i % len(_TOPICS)]} with "
                f"novel climate technology methods, batch {day}.",
            }
        )
    return {"feed": {"entry": entries}}


def nyt_transport(run_date: str) -> dict:
    """NYT Archive docs list; rows carry the _airbyte_data envelope when
    written (FIXTURES.md §2)."""
    day = int(run_date[6:])
    docs = []
    for i in range(5):
        docs.append(
            {
                "_id": f"nyt://article/{run_date}-{i}",
                "abstract": f"Green energy policy report {i}, day {day}.",
                "lead_paragraph": f"The climate innovation debate over "
                f"{_TOPICS[i % len(_TOPICS)]} continued.",
                "snippet": f"Analysis of {_TOPICS[i % len(_TOPICS)]}.",
                "pub_date": f"{_iso(run_date)}T0{i}:00:00+0000",
                "multimedia": [{"url": f"img/{i}", "Url": f"IMG/{i}"}],
            }
        )
    return {"docs": docs}


def scholar_transport(run_date: str) -> dict:
    """SerpApi-shaped payload: organic_results array; snippets mix the
    'N days ago ' prefix with plain text (FIXTURES.md §3)."""
    day = int(run_date[6:])
    results = []
    for i in range(4):
        prefix = f"{i + 1} days ago " if i % 2 == 0 else ""
        results.append(
            {
                "result_id": f"GS{run_date}{i}",
                "link": f"https://scholar.example.org/{run_date}/{i}",
                "title": f"{_TOPICS[(day + i) % len(_TOPICS)]} survey",
                "snippet": f"{prefix}findings on {_TOPICS[i % len(_TOPICS)]} "
                "and emission efficiency.",
                "position": i + 1,
                "publication_info": {"summary": f"Journal {i}, {run_date[:4]}"},
            }
        )
    return {"organic_results": results}


# ---------------------------------------------------------------------------
# fetchers — land one file per (source, run_date)
# ---------------------------------------------------------------------------


def _land(path: str, name: str, lines: list[dict]) -> str:
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, name)
    with open(out, "w", encoding="utf-8") as fh:
        for obj in lines:
            fh.write(json.dumps(obj) + "\n")
    return out


def fetch_arxiv(
    run_date: str, landing_dir: str, epoch: int, transport: Transport = arxiv_transport
) -> str:
    """Whole Atom payload as ONE json line (etl.py:62-72 lands a single
    json.dumps of the parsed feed). File prefix uses '-' separators."""
    payload = transport(run_date)
    name = f"{_iso(run_date)}_{epoch}_arxiv.jsonl"
    return _land(os.path.join(landing_dir, "arxiv"), name, [payload])


def fetch_nyt(
    run_date: str, landing_dir: str, epoch: int, transport: Transport = nyt_transport
) -> str:
    """One _airbyte_data-enveloped line per article (bronze reads
    `_airbyte_data.*`, bronze_ny_times.py:69). Prefix uses '_'."""
    payload = transport(run_date)
    lines = [{"_airbyte_data": doc} for doc in payload["docs"]]
    name = f"{format_run_date(run_date, '_')}_{epoch}_nyt.jsonl"
    return _land(os.path.join(landing_dir, "nytarchive"), name, lines)


def fetch_scholar(
    run_date: str, landing_dir: str, epoch: int, transport: Transport = scholar_transport
) -> str:
    """Single multi-line JSON document in the _airbyte_data envelope
    (read with multiLine=True, bronze_google_scholar.py:60). '_'."""
    payload = transport(run_date)
    doc = {"_airbyte_data": payload}
    path = os.path.join(landing_dir, "googlescholar")
    os.makedirs(path, exist_ok=True)
    name = f"{format_run_date(run_date, '_')}_{epoch}_scholar.jsonl"
    out = os.path.join(path, name)
    with open(out, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(doc, indent=1))
    return out


def fetch_all(run_date: str, landing_dir: str, epoch: int) -> dict[str, str]:
    """Extract-load fan-out (the DAG's three parallel EL tasks,
    cleantech.py:76-79)."""
    return {
        "arxiv": fetch_arxiv(run_date, landing_dir, epoch),
        "nytarchive": fetch_nyt(run_date, landing_dir, epoch),
        "googlescholar": fetch_scholar(run_date, landing_dir, epoch),
    }

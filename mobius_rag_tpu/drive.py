"""External drive/folder ingestion (reference: app/services/drive_sync.py
+ drive_classifier.py + main.py:6161-7060 — Google Drive OAuth, folder
scan, per-file classification, bulk import).

OAuth and the Drive API need egress this image doesn't have, so the
transport is a protocol: deployments plug a real client (Google Drive,
SharePoint, an NFS mount); tests use the in-memory one. Classification
reuses the curator's payer/authority inference plus filename heuristics
(drive_classifier.py's fallback-regex role)."""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Protocol

from mobius_rag_tpu.curator import classify_url
from mobius_rag_tpu.ingest.metadata import canonical_payer, canonical_state


class DriveClient(Protocol):
    def list_folder(self, folder_id: str) -> list[dict[str, Any]]:
        """→ [{"file_id", "name", "mime", "size"}]"""
        ...

    def download(self, file_id: str) -> bytes: ...


class InMemoryDrive:
    """Test/air-gapped drive: a dict of folders → files."""

    def __init__(self, folders: dict[str, list[tuple[str, bytes]]]):
        self._folders = folders

    def list_folder(self, folder_id: str) -> list[dict[str, Any]]:
        return [
            {"file_id": f"{folder_id}/{name}", "name": name,
             "mime": "text/plain", "size": len(data)}
            for name, data in self._folders.get(folder_id, [])
        ]

    def download(self, file_id: str) -> bytes:
        folder, name = file_id.rsplit("/", 1)
        for n, data in self._folders.get(folder, []):
            if n == name:
                return data
        raise FileNotFoundError(file_id)


_PAYERISH = re.compile(
    r"(sunshine|aetna|molina|ahca|medicaid|medicare)", re.IGNORECASE)
# letter-boundaries rather than \b: filenames use underscores, which are
# word characters ("FL_Sunshine" must still match FL)
_STATEISH = re.compile(r"(?<![A-Za-z])(FL|GA|TX|florida|georgia|texas)(?![A-Za-z])",
                       re.IGNORECASE)


def classify_file(name: str) -> dict[str, Any]:
    """Filename → payer/state guess (drive_classifier.py fallback-regex
    parity; a payor-registry service hook can override upstream)."""
    payer_m = _PAYERISH.search(name)
    state_m = _STATEISH.search(name)
    url_cls = classify_url(f"https://drive.local/{name}")
    return {
        "payer": canonical_payer(payer_m.group(1)) if payer_m else "",
        "state": canonical_state(state_m.group(1)) if state_m else "",
        "looks_like_manual": url_cls["looks_like_manual"],
    }


@dataclasses.dataclass
class DriveImportResult:
    scanned: int
    imported: list[str]
    skipped: list[dict[str, Any]]


def import_folder(pipeline, client: DriveClient, folder_id: str, *,
                  manuals_only: bool = True,
                  max_bytes: int = 50 * 1024 * 1024) -> DriveImportResult:
    """Scan a folder, classify each file, upload the keepers through the
    normal ingest path (sha-dedupe + instant-path rules apply)."""
    files = client.list_folder(folder_id)
    imported, skipped = [], []
    for f in files:
        cls = classify_file(f["name"])
        if manuals_only and not cls["looks_like_manual"]:
            skipped.append({"name": f["name"], "reason": "not manual-like"})
            continue
        if f.get("size", 0) > max_bytes:
            skipped.append({"name": f["name"], "reason": "too large"})
            continue
        data = client.download(f["file_id"])
        res = pipeline.upload(data, f["name"], payer=cls["payer"],
                              state=cls["state"])
        if res.deduped:
            skipped.append({"name": f["name"], "reason": "duplicate"})
        else:
            imported.append(res.doc_id)
    return DriveImportResult(len(files), imported, skipped)

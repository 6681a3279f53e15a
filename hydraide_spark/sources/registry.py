"""Swamp-pattern registry: per-namespace lifecycle settings, the
engine's analogue of the reference's ``RegisterSwamp`` /
``DeRegisterSwamp`` admin surface (``proto/hydraide.proto:43-49,
803-856``; ``app/core/settings/settings.go:156-275``).

The reference registers swamp *patterns* — ``sanctuary/realm/swamp``
where realm and/or swamp may be ``*`` — and resolves a concrete swamp
name to the settings of a matching pattern, falling back to built-in
defaults. Settings translate to the Spark engine as:

========================  ==============================================
reference setting         engine meaning
========================  ==============================================
``IsInMemorySwamp``       cache the current snapshot in executor memory
                          (``TreasureStore.current`` persists + pins);
                          false => every read is a parquet scan
``CloseAfterIdle``        how long the cached snapshot stays pinned
                          after last access before ``tick()`` unpersists
                          it (the reference closes+flushes idle swamps)
``WriteInterval``         processing-time trigger for streams tailing
                          the store's change log (how often data moves
                          to durable output)
``partition_by``          snapshot directory layout — the engine-native
                          replacement for ``MaxFileSize`` chunking: at
                          100 TB the partition columns decide which
                          directories a version bump rewrites and which
                          reads partition-prune
``MaxFileSize``           accepted and ignored, like the reference's V2
                          engine (proto:829-836 marks it deprecated)
========================  ==============================================

Differences from the reference, on purpose:

- **Deterministic resolution.** Go iterates a map, so with overlapping
  patterns the reference's match is arbitrary; here the MOST SPECIFIC
  pattern wins (fewest wildcards, swamp-level specificity before
  realm-level, then lexicographic) and resolution is reproducible.
- **Registry persistence is JSON at a well-known path** (same as the
  reference's settings model file), written on every mutation so a new
  session resumes the same configuration.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Optional

from ..model.name import Name

# Reference defaults for an unregistered swamp
# (app/core/settings/settings.go:265-273).
DEFAULT_CLOSE_AFTER_IDLE_SEC = 5
DEFAULT_WRITE_INTERVAL_SEC = 1


@dataclass(frozen=True)
class SwampSettings:
    """Lifecycle + layout settings for every swamp matching ``pattern``."""

    pattern: str  # "sanctuary/realm/swamp"; realm and/or swamp may be "*"
    in_memory: bool = False
    close_after_idle_sec: int = DEFAULT_CLOSE_AFTER_IDLE_SEC
    write_interval_sec: int = DEFAULT_WRITE_INTERVAL_SEC
    partition_by: tuple[str, ...] = field(default_factory=tuple)

    def __post_init__(self):
        parts = self.pattern.split("/")
        if len(parts) != 3 or not all(parts):
            raise ValueError(
                f"pattern must be 'sanctuary/realm/swamp', got {self.pattern!r}"
            )
        if parts[0] == "*":
            # reference ComparePattern (app/name/name.go:162-173):
            # sanctuary always compares exactly; only realm/swamp wildcard
            raise ValueError("sanctuary segment cannot be a wildcard")
        if self.close_after_idle_sec < 0 or self.write_interval_sec <= 0:
            # negative idle would evict the cache on every tick; a
            # non-positive trigger interval is not a valid stream cadence
            raise ValueError(
                "close_after_idle_sec must be >= 0 and write_interval_sec > 0"
            )

    # -- matching ----------------------------------------------------------

    def matches(self, name: str | Name) -> bool:
        """Reference ComparePattern: sanctuary exact; realm/swamp exact
        or ``*``."""
        path = name.path() if isinstance(name, Name) else name
        try:
            san, realm, swamp = path.split("/")
        except ValueError:
            raise ValueError(f"swamp name must be 'sanctuary/realm/swamp', got {path!r}")
        ps, pr, pw = self.pattern.split("/")
        if san != ps:
            return False
        if pr != "*" and realm != pr:
            return False
        if pw != "*" and swamp != pw:
            return False
        return True

    @property
    def specificity(self) -> tuple[int, int, str]:
        """Sort key: fewer wildcards first; an exact swamp segment is
        more specific than an exact realm segment at equal wildcard
        count; lexicographic pattern as the final deterministic tie."""
        _, pr, pw = self.pattern.split("/")
        wild = (pr == "*") + (pw == "*")
        return (wild, 1 if pw == "*" else 0, self.pattern)


def default_settings(name: str | Name) -> SwampSettings:
    """Settings for an unregistered swamp — the reference's fallback
    (settings.go:265-273): persistent, 5 s idle close, 1 s write
    interval."""
    path = name.path() if isinstance(name, Name) else name
    return SwampSettings(pattern=path)


class SwampRegistry:
    """Pattern → settings map with JSON persistence.

    ``root`` is a directory; the registry file is
    ``<root>/swamp_patterns.json`` (created on first register). A
    registry with ``root=None`` is in-memory only (tests, throwaway
    sessions).
    """

    FILE = "swamp_patterns.json"

    def __init__(self, root: Optional[str] = None):
        self.root = root
        self._patterns: dict[str, SwampSettings] = {}
        if root is not None:
            self._load()

    # -- persistence -------------------------------------------------------

    @property
    def _file(self) -> Optional[str]:
        return os.path.join(self.root, self.FILE) if self.root else None

    def _load(self) -> None:
        f = self._file
        if f and os.path.exists(f):
            with open(f) as fh:
                model = json.load(fh)
            for p, d in model.get("patterns", {}).items():
                self._patterns[p] = SwampSettings(
                    pattern=p,
                    in_memory=d["in_memory"],
                    close_after_idle_sec=d["close_after_idle_sec"],
                    write_interval_sec=d["write_interval_sec"],
                    partition_by=tuple(d.get("partition_by", ())),
                )

    def _save(self) -> None:
        f = self._file
        if f is None:
            return
        os.makedirs(self.root, exist_ok=True)
        model = {
            "patterns": {
                p: {k: v for k, v in asdict(s).items() if k != "pattern"}
                | {"partition_by": list(s.partition_by)}
                for p, s in sorted(self._patterns.items())
            }
        }
        tmp = f + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(model, fh, indent=2)
        os.replace(tmp, f)  # atomic: readers never see a torn file

    # -- admin surface -----------------------------------------------------

    def register(self, settings: SwampSettings) -> bool:
        """Upsert a pattern. Returns False (and skips the filesystem
        write) when an identical registration already exists — the
        reference's unchanged-settings short-circuit
        (settings.go:173-182)."""
        existing = self._patterns.get(settings.pattern)
        if existing == settings:
            return False
        self._patterns[settings.pattern] = settings
        self._save()
        return True

    def deregister(self, pattern: str) -> bool:
        """Remove a pattern's configuration. Swamp DATA is untouched —
        the reference contract (proto:45-49: 'does not delete the swamp
        data — it only removes its active configuration')."""
        if pattern not in self._patterns:
            return False
        del self._patterns[pattern]
        self._save()
        return True

    def patterns(self) -> list[SwampSettings]:
        return [self._patterns[p] for p in sorted(self._patterns)]

    # -- resolution --------------------------------------------------------

    def resolve(self, name: str | Name) -> SwampSettings:
        """Settings for a concrete swamp: the most specific matching
        pattern, else the reference defaults. Unlike the reference's
        map-iteration pick (settings.go:252-263), resolution order is
        total, so overlapping registrations behave predictably."""
        matches = [s for s in self._patterns.values() if s.matches(name)]
        if not matches:
            return default_settings(name)
        return min(matches, key=lambda s: s.specificity)

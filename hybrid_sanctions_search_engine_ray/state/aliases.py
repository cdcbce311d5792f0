"""Index aliases — the ES alias API re-expressed as a tiny atomic state
file (reference alias usage: the reference swaps its live index behind
a stable name after each rebuild; elasticsearch index-rotation pattern).

``aliases.json`` lives in a registry directory and maps alias →
absolute index dir. Updates go through the same write-tmp-then-rename
publish as the manifest, so a reader either sees the old mapping or the
new one — never a torn file. The canonical zero-downtime rebuild:

    build_index(input, idx_v2, cfg)
    set_alias(registry, "live", idx_v2)     # atomic swap
    # searches resolving "live" now hit v2; v1 can be deleted

At cluster scale the registry directory sits on the shared store next
to the index dirs; the swap stays a single rename."""

from __future__ import annotations

import json
import os

from hybrid_sanctions_search_engine_ray.state.manifest import atomic_write_json

_FILE = "aliases.json"


def _path(registry_dir: str) -> str:
    return os.path.join(registry_dir, _FILE)


def list_aliases(registry_dir: str) -> dict[str, str]:
    p = _path(registry_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_alias(registry_dir: str, alias: str, index_dir: str | list[str],
              require_complete: bool = True) -> None:
    """Point ``alias`` at one index dir OR a LIST of them (the ES
    multi-index alias — one name fanning out to several indices, served
    federated). Atomic either way. By default refuses to publish an
    alias to any index whose manifest is not ``complete`` — an alias
    must never expose a half-built index."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    if not dirs:
        raise ValueError("alias needs at least one index dir")
    if require_complete:
        from hybrid_sanctions_search_engine_ray.state.manifest import IndexManifest

        for d in dirs:
            m = IndexManifest.load(d)
            if m.status != "complete":
                raise ValueError(
                    f"refusing to alias {alias!r} to incomplete index {d} "
                    f"(status={m.status})"
                )
    os.makedirs(registry_dir, exist_ok=True)
    # fcntl-locked read-modify-write: two concurrent publishers on the
    # shared registry must not lose each other's alias updates
    # (code-review r05; the delete_docs tombstone pattern)
    import fcntl

    with open(os.path.join(registry_dir, ".aliases.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        aliases = list_aliases(registry_dir)
        aliases[alias] = (os.path.abspath(dirs[0]) if isinstance(index_dir, str)
                          else [os.path.abspath(d) for d in dirs])
        atomic_write_json(_path(registry_dir), aliases)


def delete_alias(registry_dir: str, alias: str) -> None:
    import fcntl

    os.makedirs(registry_dir, exist_ok=True)
    with open(os.path.join(registry_dir, ".aliases.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        aliases = list_aliases(registry_dir)
        if alias not in aliases:
            raise KeyError(f"alias {alias!r} does not exist")
        del aliases[alias]
        atomic_write_json(_path(registry_dir), aliases)


def resolve_alias(registry_dir: str, name: str) -> str | list[str]:
    """Resolve ``name`` through the registry; a name that is not an
    alias passes through unchanged (the ES convention: APIs accept
    either a concrete index or an alias). Multi-index aliases resolve
    to a LIST — feed it to ``federated.FederatedReader`` /
    ``federated_search`` for one-name fan-out search."""
    return list_aliases(registry_dir).get(name, name)

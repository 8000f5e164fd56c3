"""Schema resolution: path | name@version | name@latest.

Semantics of /root/reference/crates/ares-core/src/schema.rs:105-206:
- bare name == ``name@latest``
- ``latest`` resolves through the registry map, falling back to the
  highest semantic version on disk (1.10.0 > 1.2.0 — schema.rs:413-438)
- returns (schema_name, version, schema_dict)

Driver-side only; the resolved dict rides into UDFs via closure capture
(Spark broadcasts task closures) — no per-row resolution.
"""

from __future__ import annotations

import json
import re
from pathlib import Path


def _default_defs_dir() -> Path:
    """The packaged schema definitions. When the package is imported from
    a ``--py-files`` zip (the spark-submit ship shape), ``__file__`` points
    inside the archive and Path globbing cannot see it — extract the defs
    tree once to a content-addressed temp dir so the registry (including
    its CRUD writes) operates on a real, writable filesystem root."""
    here = Path(__file__).parent / "defs"
    if here.is_dir():
        return here
    import hashlib
    import os
    import tempfile
    import zipfile

    zip_path, _, inner = str(Path(__file__).resolve()).partition(".zip")
    zip_path += ".zip"
    prefix = str(Path(inner.lstrip("/")).parent / "defs")
    with zipfile.ZipFile(zip_path) as zf:
        names = sorted(n for n in zf.namelist() if n.startswith(prefix))
        # content-address by (name, CRC) so an edited def under an unchanged
        # filename gets a fresh extraction instead of a stale warm-node cache
        digest = hashlib.sha256(
            "".join(f"{n}:{zf.getinfo(n).CRC:08x}" for n in names).encode()
        ).hexdigest()[:16]
        out = Path(tempfile.gettempdir()) / f"ares_schemas-{digest}"
        if not out.exists():
            tmp = Path(f"{out}.tmp-{os.getpid()}")
            for n in names:
                dest = tmp / Path(n).relative_to(prefix)
                dest.parent.mkdir(parents=True, exist_ok=True)
                dest.write_bytes(zf.read(n))
            try:
                tmp.rename(out)
            except OSError:
                pass  # concurrent extractor won the rename — identical content
    return out


_DEFAULT_DIR = _default_defs_dir()

_NUM = re.compile(r"\d+")


def _version_key(v: str) -> tuple:
    # semantic compare: split numeric fields; '1.10.0' > '1.2.0'
    return tuple(int(m.group(0)) for m in _NUM.finditer(v))


def compare_versions(a: str, b: str) -> int:
    ka, kb = _version_key(a), _version_key(b)
    return (ka > kb) - (ka < kb)


class SchemaRegistry:
    def __init__(self, root: str | Path | None = None):
        # defaulted roots are SHARED (the package defs tree, or the
        # zip-extraction cache reused across runs) — CRUD copies-on-write
        # to a per-process dir so one run's edits never leak into another
        self._shared_root = root is None
        self.root = Path(root) if root else _DEFAULT_DIR
        reg = self.root / "registry.json"
        self._latest: dict[str, str] = (
            json.loads(reg.read_text()) if reg.exists() else {}
        )

    def list_versions(self, name: str) -> list[str]:
        d = self.root / name
        if not d.is_dir():
            return []
        versions = [p.stem for p in d.glob("*.json")]
        return sorted(versions, key=_version_key)

    def resolve(self, spec: str) -> tuple[str, str, dict]:
        """spec = path | name | name@version | name@latest."""
        p = Path(spec)
        if spec.endswith(".json") and p.exists():
            return p.parent.name or p.stem, p.stem, json.loads(p.read_text())
        name, _, version = spec.partition("@")
        if not version or version == "latest":
            version = self._latest.get(name) or (
                self.list_versions(name)[-1] if self.list_versions(name) else None
            )
            if version is None:
                raise FileNotFoundError(f"no versions registered for schema '{name}'")
        path = self.root / name / f"{version}.json"
        if not path.exists():
            raise FileNotFoundError(f"schema {name}@{version} not found at {path}")
        return name, version, json.loads(path.read_text())

    # -- CRUD (SURVEY.md A26; semantics of schema.rs:261-407) -----------------

    def _write_registry(self) -> None:
        (self.root / "registry.json").write_text(
            json.dumps(self._latest, indent=2, sort_keys=True) + "\n"
        )

    def _ensure_writable(self) -> None:
        if not self._shared_root:
            return
        import os
        import shutil
        import tempfile

        rw = Path(tempfile.mkdtemp(prefix=f"ares_schemas_rw-{os.getpid()}-"))
        shutil.copytree(self.root, rw, dirs_exist_ok=True)
        self.root = rw
        self._shared_root = False

    def create(self, name: str, version: str, schema: dict) -> None:
        """Register a new schema version; refuses to overwrite an existing
        one (use update). The registry latest moves forward only if the new
        version is semantically newer."""
        self._ensure_writable()
        from ares_spark.operators.validate import validate_schema

        errors = validate_schema(schema)
        if errors:
            raise ValueError(f"invalid schema document: {errors}")
        path = self.root / name / f"{version}.json"
        if path.exists():
            raise FileExistsError(f"schema {name}@{version} already exists")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(schema, indent=2) + "\n")
        cur = self._latest.get(name)
        if cur is None or compare_versions(version, cur) > 0:
            self._latest[name] = version
            self._write_registry()

    def update(self, name: str, version: str, schema: dict) -> None:
        """Overwrite an EXISTING version's document."""
        self._ensure_writable()
        from ares_spark.operators.validate import validate_schema

        errors = validate_schema(schema)
        if errors:
            raise ValueError(f"invalid schema document: {errors}")
        path = self.root / name / f"{version}.json"
        if not path.exists():
            raise FileNotFoundError(f"schema {name}@{version} not found")
        path.write_text(json.dumps(schema, indent=2) + "\n")

    def delete(self, name: str, version: str) -> None:
        """Remove a version; if it was the registry latest, fall back to the
        highest remaining version, or drop the name entirely when none
        remain (schema.rs delete-with-latest-fallback)."""
        self._ensure_writable()
        path = self.root / name / f"{version}.json"
        if not path.exists():
            raise FileNotFoundError(f"schema {name}@{version} not found")
        path.unlink()
        remaining = self.list_versions(name)
        if self._latest.get(name) == version or name not in self._latest:
            if remaining:
                self._latest[name] = remaining[-1]
            else:
                self._latest.pop(name, None)
            self._write_registry()
        if not remaining:
            try:
                path.parent.rmdir()
            except OSError:
                pass

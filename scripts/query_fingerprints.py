"""Content fingerprints for registry queries — the "has this query's code
changed since its last external certification?" primitive.

A certification snapshot (a green row in CORRECTNESS_r{N}.json) belongs to
SPECIFIC code: the query's builder function, its oracle SQL, and everything
the builder reaches inside this package (operator/function modules, shared
queries.py helpers). r7 showed that hand-curating "changed since last
certification" misses things — the shared tokenizer guard and the simhash
fix touched seven queries' semantics and none made the rotation window — so
the rotation is now computed from content hashes instead of memory.

Fingerprint of a query = sha256 over:
  - the builder function's source (which, via the ``@query`` decorator
    call, includes the query name AND the embedded oracle SQL text), plus
  - recursively, the source of every function/class defined in this
    package that the builder's code references — resolved through module
    globals AND function-body ``from .x import y`` imports, so r7-style
    shared-helper changes (``_DUCK_TOKENS``, ``operators.dedup.simhash``)
    propagate to every query that uses them, plus
  - the repr of referenced package-level constants (address-free reprs
    only — anything whose repr carries an ``at 0x`` identity is skipped as
    nondeterministic), plus
  - for names that resolve to whole package MODULES, that module file's
    content hash (coarse fallback).

The walk is source-text-only (no Spark session, no execution) and
deterministic across machines, so a fingerprint computed today is
comparable with one computed at an old git commit by running this same
module there (scripts/seed_certification_ledger.py does exactly that).

Granularity caveat (documented, accepted): dynamic dispatch the AST can't
see (methods on objects, getattr strings) is not walked; the closure is
names-and-imports. In exchange every hash input is stable source text.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import sys
import textwrap

PACKAGE = "graphsense_ethereum_etl_spark"

_CONST_TYPES = (str, bytes, int, float, bool, tuple, frozenset, type(None))


def _in_package(mod_name: str | None) -> bool:
    return bool(mod_name) and mod_name.split(".")[0] == PACKAGE


def _collect_refs(src: str, module_name: str) -> tuple[set[str], list[tuple[str, list[str]]]]:
    """(referenced names, [(resolved module, imported names), ...]) from
    the source of one function/class. Relative imports resolve against the
    defining module's package."""
    tree = ast.parse(src)
    names: set[str] = set()
    imports: list[tuple[str, list[str]]] = []
    pkg_parts = module_name.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            names.add(node.id)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_parts[: len(pkg_parts) - node.level]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if _in_package(mod):
                imports.append((mod, [a.name for a in node.names]))
        elif isinstance(node, ast.Import):
            for a in node.names:
                if _in_package(a.name):
                    imports.append((a.name, []))
    return names, imports


def _obj_token(obj, visited: set, cache: dict) -> str:
    """Deterministic text contribution of one reachable object."""
    if inspect.isfunction(obj) or inspect.isclass(obj):
        mod = getattr(obj, "__module__", None)
        if not _in_package(mod):
            return f"ext:{mod}.{getattr(obj, '__qualname__', '?')}"
        key = (mod, obj.__qualname__)
        if key in cache:
            return cache[key]
        if key in visited:
            return f"cycle:{mod}.{obj.__qualname__}"
        visited.add(key)
        try:
            src = textwrap.dedent(inspect.getsource(obj))
        except (OSError, TypeError):
            token = f"nosrc:{mod}.{obj.__qualname__}"
            cache[key] = token
            return token
        token = src + _deps_token(src, mod, visited, cache)
        cache[key] = token
        return token
    if inspect.ismodule(obj):
        if not _in_package(obj.__name__):
            return f"extmod:{obj.__name__}"
        try:
            path = inspect.getsourcefile(obj)
            with open(path, "rb") as fh:
                return f"mod:{obj.__name__}:" + hashlib.sha256(fh.read()).hexdigest()
        except (OSError, TypeError):
            return f"nosrcmod:{obj.__name__}"
    if isinstance(obj, _CONST_TYPES):
        return f"const:{obj!r}"
    r = repr(obj)
    if " at 0x" in r or "object at" in r:
        return f"opaque:{type(obj).__module__}.{type(obj).__qualname__}"
    return f"value:{r}"


def _deps_token(src: str, module_name: str, visited: set, cache: dict) -> str:
    """Concatenated tokens of everything ``src`` references, resolved via
    the defining module's globals and the source's own package imports."""
    names, imports = _collect_refs(src, module_name)
    mod_globals = sys.modules[module_name].__dict__ if module_name in sys.modules else {}
    parts: list[str] = []
    for n in sorted(names):
        if n in mod_globals:
            parts.append(f"\n# dep {n}\n" + _obj_token(mod_globals[n], visited, cache))
    for mod, imported in sorted(imports):
        try:
            m = importlib.import_module(mod)
        except ImportError:
            parts.append(f"\n# dep-import-failed {mod}")
            continue
        if not imported:
            parts.append(f"\n# dep {mod}\n" + _obj_token(m, visited, cache))
        for n in sorted(imported):
            if n == "*":
                parts.append(f"\n# dep {mod}.*\n" + _obj_token(m, visited, cache))
                continue
            if not hasattr(m, n):
                # ``from package import submodule``: the attribute exists
                # only after the submodule is imported — import it HERE or
                # the dep resolves iff some earlier walk happened to import
                # it (fingerprints must not depend on walk order; this was
                # a real nondeterminism: dd11's hash flipped between two
                # build() calls in one process)
                try:
                    importlib.import_module(f"{mod}.{n}")
                except ImportError:
                    pass
            if hasattr(m, n):
                parts.append(f"\n# dep {mod}.{n}\n" + _obj_token(getattr(m, n), visited, cache))
    return "".join(parts)


def fingerprints() -> dict[str, str]:
    """{query name: 12-hex content fingerprint} for the live registry."""
    from graphsense_ethereum_etl_spark.queries import REGISTRY

    cache: dict = {}
    out: dict[str, str] = {}
    for name, q in REGISTRY.items():
        token = _obj_token(q.fn, set(), cache)
        token += f"\n# oracle\n{q.oracle or '<rows-only>'}"
        out[name] = hashlib.sha256(token.encode()).hexdigest()[:12]
    return out


if __name__ == "__main__":
    import json
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(json.dumps(fingerprints(), indent=0, sort_keys=True))

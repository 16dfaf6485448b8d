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
  - the repr of referenced IMMUTABLE package-level constants
    (str/bytes/int/float/bool/tuple/frozenset/None), plus
  - for referenced non-const objects (dicts, lists, sets, StructTypes,
    locks, ...), the SOURCE TEXT of the module-level assignment that
    binds the name — never the live repr. A mutable container's live
    repr is runtime state: queries._SCHEMA_CACHE fills up on the first
    Spark read in the process, and hashing its contents (the pre-r10
    behavior) made every query's fingerprint depend on whether a Spark
    test had already run in the same interpreter. Fingerprint algorithm
    v2 (r10); the ledger's recorded fingerprints were migrated in the
    same commit (old-algo-unchanged queries restamped to their v2
    values, the 4 genuinely-changed queries kept their r9 stamps), plus
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

# {(module, name): concatenated binding-statement source | None}
_BINDING_CACHE: dict[tuple[str, str], str | None] = {}


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


def _binding_statements(body: list, src: str, name: str, out: list[str]) -> None:
    """Collect source segments of statements in ``body`` (descending into
    top-level If/Try/With blocks but never into function/class bodies —
    those have their own scopes) that bind ``name``."""
    for node in body:
        targets: list = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            targets = [node.target]
        for t in targets:
            elts = t.elts if isinstance(t, (ast.Tuple, ast.List)) else [t]
            if any(isinstance(e, ast.Name) and e.id == name for e in elts):
                seg = ast.get_source_segment(src, node)
                if seg:
                    out.append(seg)
        if isinstance(node, ast.If):
            _binding_statements(node.body, src, name, out)
            _binding_statements(node.orelse, src, name, out)
        elif isinstance(node, ast.Try):
            for blk in (node.body, *[h.body for h in node.handlers],
                        node.orelse, node.finalbody):
                _binding_statements(blk, src, name, out)
        elif isinstance(node, ast.With):
            _binding_statements(node.body, src, name, out)


def _binding_source(module_name: str, name: str, depth: int = 3) -> str | None:
    """Source text of the module-level statement(s) that bind ``name`` in
    ``module_name``, chasing top-level ``from .x import name`` re-exports
    up to ``depth`` hops. None when unresolvable (then the caller falls
    back to a content-free token)."""
    key = (module_name, name)
    if key in _BINDING_CACHE:
        return _BINDING_CACHE[key]
    _BINDING_CACHE[key] = None  # cycle guard
    result = None
    if _in_package(module_name):
        try:
            mod = sys.modules.get(module_name) or importlib.import_module(module_name)
            src = inspect.getsource(mod)
        except (OSError, TypeError, ImportError):
            src = None
        if src:
            tree = ast.parse(src)
            segs: list[str] = []
            _binding_statements(tree.body, src, name, segs)
            if segs:
                result = "\n".join(segs)
            elif depth > 0:
                pkg_parts = module_name.split(".")
                for node in tree.body:
                    if not isinstance(node, ast.ImportFrom):
                        continue
                    if node.level:
                        base = pkg_parts[: len(pkg_parts) - node.level]
                        mod2 = ".".join(
                            base + ([node.module] if node.module else [])
                        )
                    else:
                        mod2 = node.module or ""
                    for a in node.names:
                        if (a.asname or a.name) == name and _in_package(mod2):
                            result = _binding_source(mod2, a.name, depth - 1)
                            break
                    if result is not None:
                        break
    _BINDING_CACHE[key] = result
    return result


def _obj_token(obj, visited: set, cache: dict, binding: tuple[str, str] | None = None) -> str:
    """Deterministic text contribution of one reachable object.

    ``binding`` = (module that resolved the name, the name) — used for
    objects that are neither code nor immutable constants (dicts, lists,
    sets, StructTypes, locks, ...): their token is the SOURCE TEXT of the
    module-level assignment that created them, never their live repr.
    Live repr of a mutable container is runtime state, not content — the
    r10 bug this fixes was queries._SCHEMA_CACHE (a (sf_dir, table) →
    StructType cache filled by the first Spark read in the process)
    flipping every query's fingerprint depending on whether a Spark test
    had run earlier in the same process."""
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
    # Non-const, non-code: token by binding source, NEVER live repr.
    if binding is not None:
        src = _binding_source(*binding)
        if src is not None:
            return f"assign:{src}"
    return (
        f"nonconst:{type(obj).__module__}.{type(obj).__qualname__}"
        + (f":{binding[0]}.{binding[1]}" if binding else "")
    )


def _deps_token(src: str, module_name: str, visited: set, cache: dict) -> str:
    """Concatenated tokens of everything ``src`` references, resolved via
    the defining module's globals and the source's own package imports."""
    names, imports = _collect_refs(src, module_name)
    mod_globals = sys.modules[module_name].__dict__ if module_name in sys.modules else {}
    parts: list[str] = []
    for n in sorted(names):
        if n in mod_globals:
            parts.append(
                f"\n# dep {n}\n"
                + _obj_token(mod_globals[n], visited, cache, binding=(module_name, n))
            )
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
                parts.append(
                    f"\n# dep {mod}.{n}\n"
                    + _obj_token(getattr(m, n), visited, cache, binding=(mod, n))
                )
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

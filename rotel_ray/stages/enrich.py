"""Enrich stage: attribute actions, redaction, broadcast-lookup enrichment.

Three components, mirroring the reference's processor surface:

1. ``AttributesProcessor`` — the OTel-collector-compatible action engine
   (reference: rotel_python_processor_sdk/processors/attributes_processor.py:
   54-62 action enum, 312-378 engine, 200-225 value sourcing, 227-238 hash,
   240-272 convert, 274-298 extract). Attributes are first-class Arrow
   columns here; "key present" == value non-null, so INSERT fills nulls,
   UPDATE overwrites non-nulls, UPSERT overwrites all.

2. ``RedactionProcessor`` — allow/block key + value patterns with mask or
   hash (reference: redaction_processor.py:65-103 config, 159-269 engine).
   Adds summary count columns (the summary meta-attr analogue).

3. ``Enricher`` — a stateful actor-pool stage holding broadcast lookup tables
   (role/tool metadata), the analogue of rotel's small static enrichment maps
   (e.g. Datadog DB_TYPES, src/exporters/datadog/transform/otel_util.rs:44-58)
   and of processor state loaded once at init
   (src/init/agent.rs:798-804). Tables are ``ray.put`` once on the driver and
   ``ray.get`` once per actor in ``__init__`` — never re-shipped per batch.

All transforms are vectorized (pyarrow.compute / numpy); the only per-value
Python is hashlib digestion, batched over distinct values.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# default lookup fixtures (FIXTURES.md §4)
ROLE_META = {"user": "client", "assistant": "server", "system": "internal", "tool": "tool"}
TOOL_META = {"bash": "process", "search": "http", "browser": "http", "python": "process"}


def _hash_values(arr: pa.Array, algo: str = "sha256") -> pa.Array:
    """Hash string values; vectorized over *distinct* values via dictionary
    encoding (hash of string repr, attributes_processor.py:227-238)."""
    d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    fn = getattr(hashlib, algo)
    uniq = [None if v is None else fn(str(v).encode()).hexdigest() for v in d.dictionary.to_pylist()]
    hashed = pa.DictionaryArray.from_arrays(d.indices, pa.array(uniq, pa.string()))
    return pc.cast(hashed, pa.string())


_TRUTHY = {"true", "1", "t", "y", "yes"}


def _convert(arr: pa.Array, to: str) -> pa.Array:
    """string/int/double/bool casts with truthy-string semantics
    (attributes_processor.py:240-272)."""
    if to == "string":
        return pc.cast(arr, pa.string())
    if to == "int":
        return pc.cast(pc.cast(arr, pa.float64()), pa.int64())
    if to == "double":
        return pc.cast(arr, pa.float64())
    if to == "bool":
        if pa.types.is_string(arr.type):
            lowered = pc.utf8_lower(arr)
            return pc.is_in(lowered, value_set=pa.array(sorted(_TRUTHY)))
        return pc.cast(arr, pa.bool_())
    raise ValueError(f"unknown converted_type {to!r}")


@dataclass
class AttrAction:
    """One action; `action` in {insert, update, upsert, delete, hash,
    extract, convert} (attributes_processor.py:54-62)."""

    action: str
    key: str = ""
    value: object = None
    from_attribute: str | None = None
    pattern: str | None = None  # delete/hash by key-regex, extract regex
    converted_type: str | None = None
    hash_function: str = "sha256"


class AttributesProcessor:
    """Apply an ordered action list to each batch. Stateless task stage —
    the action list is tiny config captured in the closure (the reference
    broadcasts it to the processor chain the same way)."""

    def __init__(self, actions: list[AttrAction]):
        self.actions = actions

    def __call__(self, t: pa.Table) -> pa.Table:
        import re

        n = t.num_rows
        for a in self.actions:
            if a.action in ("insert", "update", "upsert"):
                src = (
                    t.column(a.from_attribute)
                    if a.from_attribute and a.from_attribute in t.column_names
                    else pa.nulls(n, pa.string()).fill_null(str(a.value))
                    if a.value is not None
                    else pa.nulls(n, pa.string())
                )
                if a.key in t.column_names:
                    cur = t.column(a.key)
                    if a.action == "insert":  # only where absent
                        new = pc.coalesce(cur, pc.cast(src, cur.type))
                    elif a.action == "update":  # only where present
                        new = pc.if_else(pc.is_valid(cur), pc.cast(src, cur.type), cur)
                    else:
                        new = pc.cast(src, cur.type)
                    t = t.set_column(t.column_names.index(a.key), a.key, new)
                elif a.action in ("insert", "upsert"):
                    t = t.append_column(a.key, pc.cast(src, pa.string()))
            elif a.action == "delete":
                if a.pattern:
                    rx = re.compile(a.pattern)
                    t = t.drop_columns([c for c in t.column_names if rx.fullmatch(c)])
                elif a.key in t.column_names:
                    t = t.drop_columns([a.key])
            elif a.action == "hash":
                keys = (
                    [c for c in t.column_names if re.compile(a.pattern).fullmatch(c)]
                    if a.pattern
                    else ([a.key] if a.key in t.column_names else [])
                )
                for k in keys:
                    t = t.set_column(
                        t.column_names.index(k), k, _hash_values(t.column(k), a.hash_function)
                    )
            elif a.action == "extract":
                if a.from_attribute in t.column_names and a.pattern:
                    st = pc.extract_regex(t.column(a.from_attribute).combine_chunks(), a.pattern)
                    for f in st.type:
                        col = pc.struct_field(st, f.name)
                        if f.name in t.column_names:
                            t = t.set_column(t.column_names.index(f.name), f.name, col)
                        else:
                            t = t.append_column(f.name, col)
            elif a.action == "convert":
                if a.key in t.column_names and a.converted_type:
                    t = t.set_column(
                        t.column_names.index(a.key), a.key, _convert(t.column(a.key), a.converted_type)
                    )
            else:
                raise ValueError(f"unknown action {a.action!r}")
        return t


@dataclass
class RedactionConfig:
    """redaction_processor.py:65-103 config surface (column-wise)."""

    allow_all_keys: bool = True
    allowed_keys: list[str] = field(default_factory=list)
    ignored_keys: list[str] = field(default_factory=list)
    blocked_key_patterns: list[str] = field(default_factory=list)
    blocked_value_patterns: list[str] = field(default_factory=list)
    allowed_value_patterns: list[str] = field(default_factory=list)
    mask: str = "[REDACTED]"  # or "hash:<algo>"
    apply_to: list[str] | None = None  # restrict to these columns (None = all strings)
    summary: str = "info"  # silent|info|debug (debug also emits masked key names)


class RedactionProcessor:
    """Vectorized redaction over Arrow string columns
    (redaction_processor.py:159-269). Blocked keys mask the whole column;
    blocked values mask matching cells unless an allowed pattern matches.
    With summary != silent, appends `redaction_masked_count` per row."""

    def __init__(self, cfg: RedactionConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        import re

        cfg = self.cfg
        blocked_key = [re.compile(p) for p in cfg.blocked_key_patterns]
        n = t.num_rows
        masked_count = np.zeros(n, dtype=np.int64)
        candidates = [
            c
            for c in t.column_names
            if pa.types.is_string(t.schema.field(c).type)
            and (cfg.apply_to is None or c in cfg.apply_to)
        ]
        # allow_all_keys=False: unlisted keys are deleted outright
        # (redaction_processor.py allow-list gate)
        if not cfg.allow_all_keys:
            drop = [c for c in candidates if c not in cfg.allowed_keys]
            t = t.drop_columns(drop)
            candidates = [c for c in candidates if c not in drop]

        def mask_arr(arr, mask):
            if cfg.mask.startswith("hash:"):
                return pc.if_else(mask, _hash_values(arr, cfg.mask[5:]), arr)
            return pc.if_else(mask, pa.scalar(cfg.mask), arr)

        masked_names = np.full(n, "", dtype=object) if cfg.summary == "debug" else None
        for c in candidates:
            arr = t.column(c).combine_chunks()
            if any(rx.search(c) for rx in blocked_key):
                mask = pc.is_valid(arr)
            else:
                mask = pa.array(np.zeros(n, dtype=bool))
                for p in cfg.blocked_value_patterns:
                    mask = pc.or_(mask, pc.fill_null(pc.match_substring_regex(arr, p), False))
                for p in cfg.allowed_value_patterns:
                    mask = pc.and_(mask, pc.invert(pc.fill_null(pc.match_substring_regex(arr, p), False)))
            if pc.any(mask).as_py():
                t = t.set_column(t.column_names.index(c), c, mask_arr(arr, mask))
                m = mask.to_numpy(zero_copy_only=False)
                masked_count += m.astype(np.int64)
                if masked_names is not None:
                    # candidates iterate in column order, so names come out
                    # sorted by schema position (stable across batches)
                    masked_names[m] = np.where(masked_names[m] == "", c,
                                               masked_names[m] + "," + c)
        if cfg.summary != "silent":
            t = t.append_column("redaction_masked_count", pa.array(masked_count))
        if masked_names is not None:
            # redaction.<ctx>.masked_keys.names analogue (_add_meta_attrs,
            # redaction_processor.py:121-158) as a per-row csv column
            t = t.append_column("redaction_masked_keys", pa.array(list(masked_names), pa.string()))
        return t


class BodyRedactor:
    """Recursive log-body redaction (redaction_processor.py:318-397): walks a
    JSON body value tree; string leaves are matched against
    ``blocked_value_patterns`` (unless an ``allowed_value_patterns`` entry
    matches), and matched substrings are substituted with the mask / hash.
    Key gates mirror the reference: keys in ``ignored_keys`` are skipped,
    and with ``allow_all_keys=False`` keys outside ``allowed_keys`` are not
    descended into (tracked as redacted). With ``summary != "silent"`` the
    per-row meta columns ``body_masked_count`` / ``body_masked_keys`` are
    appended (the redaction.body.masked.* meta-attrs).

    Quirk preserved from the reference: the substitution value is derived
    from the FIRST match (``pattern.sub(redacted(match.group(0)), s)``), so
    with a hash mask every occurrence in one string gets the first match's
    hash."""

    def __init__(self, cfg: RedactionConfig, body_col: str = "body"):
        import re

        self.cfg = cfg
        self.body_col = body_col
        self.blocked = [re.compile(p) for p in cfg.blocked_value_patterns]
        self.allowed = [re.compile(p) for p in cfg.allowed_value_patterns]
        self.ignored_keys = set(getattr(cfg, "ignored_keys", []) or [])
        self.allowed_keys = set(cfg.allowed_keys)

    def _redacted_value(self, s: str) -> str:
        if self.cfg.mask.startswith("hash:"):
            return hashlib.new(self.cfg.mask[5:], s.encode()).hexdigest()
        return self.cfg.mask

    def _walk(self, v, key, masked: set, redacted: set, ignored: set, allowed: set):
        if isinstance(v, str):
            tmp = v
            changed = False
            for rx in self.blocked:
                m = rx.search(tmp)
                if m:
                    if any(a.search(tmp) for a in self.allowed):
                        if key is not None:
                            allowed.add(key)
                        continue
                    tmp = rx.sub(self._redacted_value(m.group(0)), tmp)
                    changed = True
            if changed and key is not None:
                masked.add(key)
            return tmp
        if isinstance(v, dict):
            out = {}
            for k, item in v.items():
                if k in self.ignored_keys:
                    ignored.add(k)
                    out[k] = item
                    continue
                if not self.cfg.allow_all_keys and k not in self.allowed_keys:
                    redacted.add(k)
                    out[k] = item
                    continue
                out[k] = self._walk(item, k, masked, redacted, ignored, allowed)
            return out
        if isinstance(v, list):
            return [self._walk(x, None, masked, redacted, ignored, allowed) for x in v]
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        bodies = t.column(self.body_col).to_pylist()
        out, n_masked, masked_names = [], [], []
        for b in bodies:
            masked, redacted, ignored, allowed = set(), set(), set(), set()
            if b is None:
                out.append(None)
            elif b.startswith("{") or b.startswith("["):
                try:
                    parsed = json.loads(b)
                except ValueError:
                    parsed = None
                if isinstance(parsed, (dict, list)):
                    red = self._walk(parsed, None, masked, redacted, ignored, allowed)
                    out.append(json.dumps(red, separators=(",", ":")))
                else:
                    out.append(self._walk(b, None, masked, redacted, ignored, allowed))
            else:
                new = self._walk(b, "__root__", masked, redacted, ignored, allowed)
                out.append(new)
                masked.discard("__root__")
                if new != b:
                    masked.add("body")
            n_masked.append(len(masked))
            masked_names.append(",".join(sorted(masked)))
        idx = t.column_names.index(self.body_col)
        t = t.set_column(idx, self.body_col, pa.array(out, pa.string()))
        if self.cfg.summary != "silent":
            t = t.append_column("body_masked_count", pa.array(n_masked, pa.int64()))
            t = t.append_column("body_masked_keys", pa.array(masked_names, pa.string()))
        return t


def _lookup(arr, mapping: dict[str, str]) -> pa.Array:
    keys = pa.array(list(mapping.keys()))
    vals = pa.array(list(mapping.values()))
    return pc.take(vals, pc.index_in(arr, keys))


class Enricher:
    """Actor-pool enrichment stage. Lookup tables are fetched from the object
    store exactly once per actor (broadcast pattern); per batch the lookups
    are dictionary-joined with pc.index_in/take — no shuffle.

    Adds: role_side (ROLE_META), tool_kind (TOOL_META), resource upserts
    (the --otel-resource-attributes analogue,
    src/topology/generic_pipeline.rs:70-108)."""

    def __init__(self, role_ref=None, tool_ref=None, resource_attrs: dict | None = None):
        self.role_meta = ray.get(role_ref) if role_ref is not None else ROLE_META
        self.tool_meta = ray.get(tool_ref) if tool_ref is not None else TOOL_META
        self.resource_attrs = resource_attrs or {}

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.append_column("role_side", _lookup(t.column("role").combine_chunks(), self.role_meta))
        tool_col = "tool_name" if "tool_name" in t.column_names else "tool"
        t = t.append_column("tool_kind", _lookup(t.column(tool_col).combine_chunks(), self.tool_meta))
        for k, v in self.resource_attrs.items():
            # upsert preserving insertion order (IndexMap semantics,
            # generic_pipeline.rs:70-108)
            val = pa.nulls(t.num_rows, pa.string()).fill_null(str(v))
            if k in t.column_names:
                t = t.set_column(t.column_names.index(k), k, val)
            else:
                t = t.append_column(k, val)
        return t


def context_enrich(ds, context: dict[str, str], prefix: str = "http.request.header."):
    """RequestContext propagation: attach request-context entries (HTTP/gRPC
    headers captured at the source) as constant columns on every row — the
    context processor (rotel_python_processor_sdk/processors/
    context_processor.py:42-141, header -> `http.request.header.*` attr).
    The context dict is tiny config captured in the closure."""

    def f(t: pa.Table) -> pa.Table:
        for k, v in context.items():
            t = t.append_column(prefix + k, pa.nulls(t.num_rows, pa.string()).fill_null(str(v)))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# per-worker-process Enricher cache for the fused tasks mode: state is still
# "loaded once per worker" (the actor-pool guarantee), but the stage stays a
# plain function so Ray Data FUSES read->parse->enrich->route into one task —
# no object-store hop between parse and enrich. Keyed by the broadcast refs
# so config changes get a fresh instance.
_ENRICHER_CACHE: dict = {}


def _enricher_for(role_ref, tool_ref, resource_attrs) -> Enricher:
    key = (role_ref.hex() if role_ref is not None else None,
           tool_ref.hex() if tool_ref is not None else None,
           tuple(sorted((resource_attrs or {}).items())))
    e = _ENRICHER_CACHE.get(key)
    if e is None:
        e = _ENRICHER_CACHE[key] = Enricher(role_ref, tool_ref, resource_attrs)
    return e


def enrich_stage(ds, *, concurrency: int | tuple = 4, batch_size: int = 16384,
                 resource_attrs: dict | None = None, role_meta=None, tool_meta=None,
                 compute: str = "tasks"):
    """Attach the enrichment stage. Lookups are ray.put once here.

    compute="tasks" (default): plain-function stage with per-worker cached
    state — fuses with the surrounding map stages (measured 2x faster for
    light lookup state: the actor boundary forces parse output through the
    object store). compute="actors": a bounded actor pool — use when the
    state is heavy (models, big indexes) so instance count is capped at
    `concurrency` instead of one per worker process."""
    role_ref = ray.put(role_meta or ROLE_META)
    tool_ref = ray.put(tool_meta or TOOL_META)
    if compute == "actors":
        return ds.map_batches(
            Enricher,
            fn_constructor_kwargs={
                "role_ref": role_ref,
                "tool_ref": tool_ref,
                "resource_attrs": resource_attrs,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )

    def fn(t: pa.Table) -> pa.Table:
        return _enricher_for(role_ref, tool_ref, resource_attrs)(t)

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

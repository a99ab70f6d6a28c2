"""The semantic kernel: per-document time-series sample extraction.

A from-scratch re-implementation of the behaviour of the reference's
``TimeSeriesExtractor`` (``/root/reference/src/JsonTimeSeriesExtractor/
TimeSeriesExtractor.cs``), written as a pure-Python generator so that it can
be wrapped by a vectorizing Ray Data ``map_batches`` stage
(``stages/extract.py``) and reused as the single-process oracle in tests.

One parsed JSON document in -> zero or more :class:`Sample` records out, in
document order (object property order, then array order) — the same lazy
per-document contract as the reference's ``GetSamples`` iterators
(``TimeSeriesExtractor.cs:399-401,426-438,471-482``).

Semantics mirrored (each with its reference anchor):

* array-of-documents unrolling (``:425-438``)
* document timestamp resolution with fallback provider / current-time
  (``:456-467``), nested timestamps (``:546-571``), timestamp-property
  suppression (``TimeSeriesExtractorContext.cs:94-99``)
* depth-gated recursion with raw-JSON-text samples at the depth limit
  (``:501-541``), effective max depth (``TimeSeriesExtractorContext.cs:58-62``)
* include/exclude filters called both at traversal time and at sample-build
  time (``:507-509`` and ``:600-602``)
* key templates with ``{$prop}``/``{$prop-local}``/``{$prop-path}`` and
  document-property placeholders (``:689-902``), array-index suppression
  built from the element stack — not the pointer — so integer-named object
  properties survive (``:818-832``)
* value coercion: number->float, string, bool, object/array->raw JSON text,
  null (``:929-937``)

Timestamps are ``int`` nanoseconds since epoch UTC throughout (see
``functions/timestamps.py`` for why microseconds are not enough).
"""

from __future__ import annotations

import json
import numbers

from .functions.jsonio import loads as _json_loads
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Iterator, NamedTuple, Optional, Sequence, Union

from .functions.match import MatchRule, make_pointer_filter
from .functions.pointer import (
    MISSING,
    Pointer,
    evaluate_pointer,
    parse_pointer,
    pointer_to_string,
)
from .functions.rawtext import element_display_value, raw_json_text
from .functions.timestamps import (
    TimestampSource,
    now_ns,
    parse_iso_timestamp_ns,
    unix_ms_to_ns,
)

DEFAULT_TEMPLATE = "{$prop}"
DEFAULT_TIMESTAMP_PROPERTY = "/time"
DEFAULT_PATH_SEPARATOR = "/"
DEFAULT_MAX_DEPTH = 5

FULL_PROPERTY_NAME_PLACEHOLDER = "{$prop}"
LOCAL_PROPERTY_NAME_PLACEHOLDER = "{$prop-local}"


class ValueKind:
    """Which logical value a sample carries (mirrors the ``JsonValueKind``
    switch at ``TimeSeriesExtractor.cs:929-937``)."""

    NULL = 0
    NUMBER = 1
    STRING = 2
    BOOL = 3
    JSON_TEXT = 4  # object/array rendered to raw JSON text


class Sample(NamedTuple):
    """Engine equivalent of ``TimeSeriesSample`` (``TimeSeriesSample.cs:8-53``)."""

    key: str
    ts_ns: int
    ts_source: int
    value: Any
    value_kind: int


class OptionsValidationError(ValueError):
    """Invalid :class:`ExtractorOptions` (mirrors DataAnnotations validation,
    ``TimeSeriesExtractorOptions.cs:404-408``)."""


class _UnresolvedTemplate(Exception):
    """Internal: template placeholder could not be resolved and unresolved
    replacements are disallowed -> skip the sample
    (``TimeSeriesExtractor.cs:611-614,764-766``)."""


def _as_pointer(value, *, what: str) -> Optional[Pointer]:
    if value is None:
        return None
    if isinstance(value, tuple):
        return value
    if isinstance(value, str):
        try:
            return parse_pointer(value)
        except ValueError as exc:
            raise OptionsValidationError(f"{what}: {exc}") from exc
    raise OptionsValidationError(f"{what}: expected pointer string or tuple, got {type(value)!r}")


@dataclass
class ExtractorOptions:
    """Engine equivalent of ``TimeSeriesExtractorOptions``
    (``TimeSeriesExtractorOptions.cs:13-410``).

    Callable hooks (the reference's delegate surface, §2.9 of SURVEY.md) must
    be cloudpickle-able when the options object is shipped into a Ray stage:

    * ``can_process_element(ctx, pointer, element) -> bool``
    * ``timestamp_parser(element) -> int nanoseconds | None``
    * ``get_default_timestamp() -> int nanoseconds``
    * ``get_template_replacement(name) -> str | None``
    """

    start_at: Union[str, Pointer, None] = None
    template: str = DEFAULT_TEMPLATE
    get_template_replacement: Optional[Callable[[str], Optional[str]]] = None
    allow_unresolved_template_replacements: bool = True
    timestamp_property: Union[str, Pointer, None] = DEFAULT_TIMESTAMP_PROPERTY
    timestamp_parser: Optional[Callable[[Any], Optional[int]]] = None
    get_default_timestamp: Optional[Callable[[], int]] = None
    allow_nested_timestamps: bool = False
    can_process_element: Optional[Callable[["ExtractionContext", Pointer, Any], bool]] = None
    recursive: bool = False
    max_depth: int = DEFAULT_MAX_DEPTH
    path_separator: str = DEFAULT_PATH_SEPARATOR
    include_array_indexes_in_sample_keys: bool = True

    def copy(self, **changes) -> "ExtractorOptions":
        """Derive a new options object (mirrors the copy constructor,
        ``TimeSeriesExtractorOptions.cs:382-400``)."""
        return replace(self, **changes)

    def validate(self) -> None:
        if self.template is None or not str(self.template).strip():
            raise OptionsValidationError("The template cannot be null or white space.")
        if self.path_separator is None or self.path_separator == "":
            raise OptionsValidationError("The path separator is required.")

    @classmethod
    def from_dict(cls, config: dict) -> "ExtractorOptions":
        """Build options from a string-keyed job-config mapping.

        The engine twin of binding ``TimeSeriesExtractorOptions`` from
        ``Microsoft.Extensions.Configuration`` string values
        (``ConfigurationBinderTests.cs:11-134``): invalid pointers raise,
        empty strings bind to ``None``, and include/exclude rules are
        classified exactly like ``JsonPointerMatch``.
        """
        cfg = dict(config)
        opts = cls()
        simple = {
            "template": str,
            "allow_unresolved_template_replacements": bool,
            "allow_nested_timestamps": bool,
            "recursive": bool,
            "max_depth": int,
            "path_separator": str,
            "include_array_indexes_in_sample_keys": bool,
        }
        def _as_bool(key, raw):
            # string-config parity with the .NET binder: "false"/"0" must
            # bind to False (Python's bool("false") is True)
            if isinstance(raw, bool):
                return raw
            if isinstance(raw, (int, float)) and raw in (0, 1):
                return bool(raw)
            if isinstance(raw, str):
                low = raw.strip().lower()
                if low in ("true", "1", "yes"):
                    return True
                if low in ("false", "0", "no"):
                    return False
            raise OptionsValidationError(
                f"Option {key!r} expects a boolean, got {raw!r}"
            )

        for key, typ in simple.items():
            if key in cfg and cfg[key] is not None:
                raw = cfg.pop(key)
                setattr(opts, key,
                        _as_bool(key, raw) if typ is bool else typ(raw))
        for key in ("start_at", "timestamp_property"):
            if key in cfg:
                raw = cfg.pop(key)
                if raw is None or raw == "":
                    setattr(opts, key, None)
                else:
                    setattr(opts, key, pointer_to_string(_as_pointer(raw, what=key)))
        include = cfg.pop("include", None)
        exclude = cfg.pop("exclude", None)
        allow_wildcards = _as_bool(
            "allow_wildcard_expressions",
            cfg.pop("allow_wildcard_expressions", False),
        )
        if include is not None or exclude is not None:
            include = [r for r in (include or []) if r not in (None, "")] or None
            exclude = [r for r in (exclude or []) if r not in (None, "")] or None
            for rule in (include or []) + (exclude or []):
                try:
                    MatchRule.parse(rule)
                except (TypeError, ValueError) as exc:
                    raise OptionsValidationError(
                        f"Invalid include/exclude rule {rule!r}: {exc}"
                    ) from exc
            opts.can_process_element = make_pointer_filter(
                include=include, exclude=exclude, allow_wildcards=allow_wildcards
            )
        if cfg:
            raise OptionsValidationError(f"Unknown option keys: {sorted(cfg)}")
        return opts


class _TemplatePlan(NamedTuple):
    segments: tuple  # of ("lit", text) | ("ph", name)
    is_default: bool
    has_placeholders: bool


def _parse_template(template: str, recursive: bool) -> _TemplatePlan:
    """Pre-parse the key template once (the reference matches a regex per
    sample, ``TimeSeriesExtractor.cs:28-34,708``; we pay parsing once per
    plan instead)."""
    is_default = (
        template == FULL_PROPERTY_NAME_PLACEHOLDER
        if recursive
        else template in (FULL_PROPERTY_NAME_PLACEHOLDER, LOCAL_PROPERTY_NAME_PLACEHOLDER)
    )
    has_placeholders = is_default or "{" in template
    segments = []
    i = 0
    n = len(template)
    while i < n:
        open_idx = template.find("{", i)
        if open_idx < 0:
            segments.append(("lit", template[i:]))
            break
        close_idx = template.find("}", open_idx + 1)
        if close_idx < 0 or close_idx == open_idx + 1:
            # No closing brace (or empty name "{}"): the regex `[^\}]+?`
            # requires at least one char; treat as literal text.
            segments.append(("lit", template[i : open_idx + 1]))
            i = open_idx + 1
            continue
        if open_idx > i:
            segments.append(("lit", template[i:open_idx]))
        segments.append(("ph", template[open_idx + 1 : close_idx]))
        i = close_idx + 1
    return _TemplatePlan(tuple(segments), is_default, has_placeholders)


class ExtractionPlan:
    """Per-options compiled state.

    The reference builds this once per ``GetSamples`` call (compiled regexes,
    match segments, template classification — ``TimeSeriesExtractor.cs:140-266``,
    ``TimeSeriesExtractorContext.cs:55-79``).  In the engine a plan is built
    once per *worker* (actor ``__init__``) and reused across every document of
    every batch.
    """

    __slots__ = (
        "options",
        "start_at",
        "timestamp_property",
        "max_depth",
        "template",
        "filter",
        "key_cache",
        "fast_leaf",
        "ts_prop_single",
    )

    def __init__(self, options: ExtractorOptions):
        options.validate()
        self.options = options
        self.start_at = _as_pointer(options.start_at, what="start_at")
        self.timestamp_property = _as_pointer(
            options.timestamp_property, what="timestamp_property"
        )
        # Effective depth limit (TimeSeriesExtractorContext.cs:58-62).
        self.max_depth = (
            (DEFAULT_MAX_DEPTH if options.max_depth < 1 else options.max_depth)
            if options.recursive
            else 1
        )
        self.template = _parse_template(options.template, options.recursive)
        self.filter = options.can_process_element
        # pointer -> rendered default key.  Document shapes repeat across a
        # corpus, so the distinct-pointer set is tiny relative to sample
        # count; bounded in _full_property_name against pathological shapes.
        self.key_cache: dict = {}
        # Fast leaf path eligibility: with no user filter, the default
        # template, and array indexes kept in keys, a leaf sample reduces to
        # suppression-check + cached pointer->key lookup + value coercion —
        # the element-stack push and double filter check are observably
        # side-effect-free and are skipped in _process_object_items.
        self.fast_leaf = (
            self.filter is None
            and self.template.is_default
            and options.include_array_indexes_in_sample_keys
            and options.recursive
        )
        # Single-segment timestamp pointers (the default /time, and most
        # real configs) resolve with one dict lookup — no pointer walk.
        self.ts_prop_single = (
            self.timestamp_property[0]
            if self.timestamp_property is not None
            and len(self.timestamp_property) == 1
            else None
        )

    def key_for_pointer(self, ptr: Pointer) -> str:
        """Default-template key for ``ptr`` (the include-all branch of
        ``GetFullPropertyName``, ``TimeSeriesExtractor.cs:778-837``), cached."""
        key = self.key_cache.get(ptr)
        if key is not None:
            return key
        sep = self.options.path_separator
        if sep == DEFAULT_PATH_SEPARATOR:
            s = pointer_to_string(ptr)
            key = s[1:] if s.startswith("/") else s
        else:
            key = sep.join(ptr)
        if len(self.key_cache) < 65536:
            self.key_cache[ptr] = key
        return key


class ExtractionContext:
    """Per-document traversal state (element + timestamp stacks), the engine
    twin of ``TimeSeriesExtractorContext`` (``TimeSeriesExtractorContext.cs``).

    ``element_stack`` entries are ``(key, element, is_array_item)`` — key is
    ``None`` for the root — root at index 0, current element last, exactly the
    bottom-to-top order of the reference's ``ElementStack.AsSpan()``.
    ``timestamp_stack`` entries are ``(ts_ns, source, pointer_or_None)``.
    """

    __slots__ = ("plan", "options", "max_depth", "element_stack", "timestamp_stack")

    def __init__(self, plan: ExtractionPlan):
        self.plan = plan
        self.options = plan.options
        self.max_depth = plan.max_depth
        self.element_stack: list = []
        self.timestamp_stack: list = []

    def can_process_element(self, ptr: Pointer, element) -> bool:
        """Timestamp-property suppression + user filter
        (``TimeSeriesExtractorContext.cs:94-102``)."""
        ts = self.timestamp_stack[-1]
        if ts[2] is not None and ptr == ts[2]:
            return False
        flt = self.plan.filter
        return flt is None or flt(self, ptr, element)


def _try_get_timestamp(element, plan: ExtractionPlan) -> Optional[int]:
    """Resolve + parse the timestamp property against ``element``
    (``TryGetTimestamp``, ``TimeSeriesExtractor.cs:637-674``)."""
    ptr = plan.timestamp_property
    if ptr is None or not isinstance(element, dict):
        return None
    single = plan.ts_prop_single
    if single is not None:
        value = element.get(single, MISSING)
    else:
        value = evaluate_pointer(element, ptr)
    if value is MISSING:
        return None
    parser = plan.options.timestamp_parser
    if parser is not None:
        return parser(value)
    if isinstance(value, str):
        return parse_iso_timestamp_ns(value)
    if isinstance(value, int) and not isinstance(value, bool):
        return unix_ms_to_ns(value)
    return None


def _coerce_value(element):
    """Value coercion switch (``BuildSampleFromJsonValue``,
    ``TimeSeriesExtractor.cs:923-938``)."""
    if isinstance(element, bool):
        return element, ValueKind.BOOL
    if isinstance(element, (int, float)):
        return float(element), ValueKind.NUMBER
    if isinstance(element, str):
        return element, ValueKind.STRING
    if isinstance(element, (dict, list)):
        return raw_json_text(element), ValueKind.JSON_TEXT
    if isinstance(element, numbers.Number):
        # non-builtin numerics produced by parse_float / parse_int hooks
        # (e.g. decimal.Decimal) keep the hook's type — coercing to float
        # would defeat the hook
        return element, ValueKind.NUMBER
    return None, ValueKind.NULL


def _full_property_name(ctx: ExtractionContext, ptr: Pointer, force_local: bool = False) -> str:
    """``{$prop}`` / ``{$prop-local}`` (``GetFullPropertyName``,
    ``TimeSeriesExtractor.cs:778-837``)."""
    options = ctx.options
    if not options.recursive or force_local:
        return ptr[-1] if ptr else ""
    stack = ctx.element_stack
    include_all = options.include_array_indexes_in_sample_keys or not any(
        entry[2] for entry in stack
    )
    sep = options.path_separator
    if include_all:
        return ctx.plan.key_for_pointer(ptr)
    # Array-index suppression builds the key from the element stack, not the
    # pointer, preserving integer-named object properties (:818-832).
    parts = [entry[0] for entry in stack if entry[0] is not None and not entry[2]]
    return sep.join(parts)


def _property_path(ctx: ExtractionContext, ptr: Pointer) -> str:
    """``{$prop-path}`` (``GetPropertyPath``, ``TimeSeriesExtractor.cs:840-901``)."""
    options = ctx.options
    if not options.recursive or len(ptr) <= 1:
        return ""
    stack = ctx.element_stack
    use_direct = options.include_array_indexes_in_sample_keys or not any(
        entry[2] for entry in stack
    )
    sep = options.path_separator
    if use_direct:
        ancestor = ptr[:-1]
        if sep == DEFAULT_PATH_SEPARATOR:
            s = pointer_to_string(ancestor)
            return s[1:] if s.startswith("/") else s
        return sep.join(ancestor)
    parts = [
        entry[0] for entry in stack[:-1] if entry[0] is not None and not entry[2]
    ]
    return sep.join(parts)


def _render_template(ctx: ExtractionContext, ptr: Pointer) -> str:
    """Key generation (``BuildSampleKeyFromTemplate``,
    ``TimeSeriesExtractor.cs:689-902``)."""
    plan = ctx.plan
    tmpl = plan.template
    if tmpl.is_default:
        return _full_property_name(ctx, ptr)
    if not tmpl.has_placeholders:
        return ctx.options.template
    options = ctx.options
    out = []
    for kind, text in tmpl.segments:
        if kind == "lit":
            out.append(text)
            continue
        name = text
        if name == "$prop" or name == "$prop-local":
            out.append(_full_property_name(ctx, ptr, name == "$prop-local"))
            continue
        if name == "$prop-path":
            out.append(_property_path(ctx, ptr))
            continue
        if options.recursive:
            # Collect the property from every ancestor object, root first,
            # joined with the path separator (:721-751).
            vals = [
                element_display_value(entry[1][name])
                for entry in ctx.element_stack
                if isinstance(entry[1], dict) and name in entry[1]
            ]
            if vals:
                out.append(options.path_separator.join(vals))
                continue
        else:
            # Nearest object: the reference scans its stack buffer bottom-up
            # (ElementStack.cs:147-159), i.e. root-most object first.
            closest = next(
                (entry[1] for entry in ctx.element_stack if isinstance(entry[1], dict)),
                None,
            )
            if closest is not None and name in closest:
                out.append(element_display_value(closest[name]))
                continue
        repl = (
            options.get_template_replacement(name)
            if options.get_template_replacement is not None
            else None
        )
        if repl is None and not options.allow_unresolved_template_replacements:
            raise _UnresolvedTemplate(name)
        out.append(repl if repl is not None else "{" + name + "}")
    return "".join(out)


def _build_sample(ctx: ExtractionContext, ptr: Pointer, element) -> Optional[Sample]:
    """``BuildSample`` (``TimeSeriesExtractor.cs:598-615``): the filter is
    intentionally re-checked here, as in the reference."""
    if not ctx.can_process_element(ptr, element):
        return None
    try:
        key = _render_template(ctx, ptr)
    except _UnresolvedTemplate:
        return None
    ts_ns, source, _ = ctx.timestamp_stack[-1]
    value, kind = _coerce_value(element)
    return Sample(key, ts_ns, source, value, kind)


def _samples_core(ctx: ExtractionContext, depth: int, ptr: Pointer, out: list) -> None:
    """Recursive element dispatch (``TimeSeriesExtractor.cs:501-541``).

    Accumulator style (append to ``out``) rather than nested generators:
    the 4-level ``yield from`` chain measured ~25% of kernel time.
    """
    element = ctx.element_stack[-1][1]
    if not ctx.can_process_element(ptr, element):
        return
    if not ctx.options.recursive or depth >= ctx.max_depth:
        sample = _build_sample(ctx, ptr, element)
        if sample is not None:
            out.append(sample)
        return
    if isinstance(element, dict):
        _process_object(ctx, depth, ptr, element, out)
    elif isinstance(element, list):
        _process_array(ctx, depth, ptr, element, out)
    else:
        sample = _build_sample(ctx, ptr, element)
        if sample is not None:
            out.append(sample)


def _process_object(ctx: ExtractionContext, depth: int, ptr: Pointer, element: dict,
                    out: list) -> None:
    """Object traversal + nested timestamps (``TimeSeriesExtractor.cs:546-571``)."""
    options = ctx.options
    pop_timestamp = False
    if options.allow_nested_timestamps and ctx.plan.timestamp_property is not None:
        ts = _try_get_timestamp(element, ctx.plan)
        if ts is not None:
            ctx.timestamp_stack.append(
                (ts, TimestampSource.DOCUMENT, ptr + ctx.plan.timestamp_property)
            )
            pop_timestamp = True
    _process_object_items(ctx, depth, ptr, element, out)
    if pop_timestamp:
        ctx.timestamp_stack.pop()


def _process_object_items(ctx: ExtractionContext, depth: int, ptr: Pointer,
                          element: dict, out: list) -> None:
    """Property loop shared by nested objects and the document root
    (``TimeSeriesExtractor.cs:471-482,560-567``)."""
    plan = ctx.plan
    stack = ctx.element_stack
    deeper = depth + 1
    max_depth = ctx.max_depth
    if plan.fast_leaf:
        # The top of the timestamp stack is loop-invariant (child calls
        # push/pop in balance), so hoist it; leaves reduce to suppression
        # check + cached key + coercion.  tuple.__new__ skips the generated
        # NamedTuple __new__ wrapper (~1 us/sample under profile).
        ts_ns, ts_source, ts_ptr = ctx.timestamp_stack[-1]
        key_for_pointer = plan.key_for_pointer
        new_sample = tuple.__new__
        for name, value in element.items():
            child_ptr = ptr + (name,)
            if deeper < max_depth and isinstance(value, (dict, list)):
                stack.append((name, value, False))
                _samples_core(ctx, deeper, child_ptr, out)
                stack.pop()
            else:
                if ts_ptr is not None and child_ptr == ts_ptr:
                    continue
                # Inline coercion for the dominant exact types (json.loads
                # emits exact float/str/int); subclasses and containers fall
                # back to the full _coerce_value switch.
                tv = type(value)
                if tv is float:
                    value_coerced, kind = value, 1
                elif tv is str:
                    value_coerced, kind = value, 2
                elif tv is int:
                    value_coerced, kind = float(value), 1
                else:
                    value_coerced, kind = _coerce_value(value)
                out.append(
                    new_sample(
                        Sample,
                        (key_for_pointer(child_ptr), ts_ns, ts_source,
                         value_coerced, kind),
                    )
                )
        return
    for name, value in element.items():
        child_ptr = ptr + (name,)
        if deeper < max_depth and isinstance(value, (dict, list)):
            stack.append((name, value, False))
            _samples_core(ctx, deeper, child_ptr, out)
            stack.pop()
        else:
            # Leaf (or depth-limited container): inline the _samples_core
            # leaf branch — push, traversal gate, then _build_sample (which
            # re-checks the filter, as the reference does).  The push
            # precedes the gate so filter delegates see the same
            # element-stack state as on the recursive path.
            stack.append((name, value, False))
            if ctx.can_process_element(child_ptr, value):
                sample = _build_sample(ctx, child_ptr, value)
                if sample is not None:
                    out.append(sample)
            stack.pop()


_INDEX_STRINGS = tuple(map(str, range(4096)))


def _process_array(ctx: ExtractionContext, depth: int, ptr: Pointer, element: list,
                   out: list) -> None:
    """Array traversal (``TimeSeriesExtractor.cs:576-593``)."""
    stack = ctx.element_stack
    deeper = depth + 1
    index_strings = _INDEX_STRINGS
    for index, item in enumerate(element):
        key = index_strings[index] if index < 4096 else str(index)
        stack.append((key, item, True))
        _samples_core(ctx, deeper, ptr + (key,), out)
        stack.pop()


def _samples_from_object(
    element: dict, plan: ExtractionPlan, fallback_now_ns: Optional[int], out: list
) -> None:
    """Root object processing (``GetSamplesCore(JsonElement, options)``,
    ``TimeSeriesExtractor.cs:453-483``)."""
    ctx = ExtractionContext(plan)
    ts = _try_get_timestamp(element, plan)
    if ts is None:
        get_default = plan.options.get_default_timestamp
        if get_default is not None:
            default = (get_default(), TimestampSource.FALLBACK_PROVIDER, None)
        else:
            # Distributed runs inject fallback_now_ns for determinism; the
            # wall clock remains only for single-process API parity with
            # DateTimeOffset.UtcNow (TimeSeriesExtractor.cs:461).
            now = fallback_now_ns if fallback_now_ns is not None else now_ns()
            default = (now, TimestampSource.CURRENT_TIME, None)
    else:
        default = (ts, TimestampSource.DOCUMENT, plan.timestamp_property)
    ctx.timestamp_stack.append(default)
    ctx.element_stack.append((None, element, False))
    _process_object_items(ctx, 0, (), element, out)


def _samples_from_root(element, plan: ExtractionPlan, fallback_now_ns, out: list) -> None:
    """Array-of-documents unrolling (``GetSamplesFromRootElement``,
    ``TimeSeriesExtractor.cs:425-438``): non-object/non-array roots emit
    nothing."""
    if isinstance(element, list):
        for item in element:
            _samples_from_root(item, plan, fallback_now_ns, out)
    elif isinstance(element, dict):
        _samples_from_object(element, plan, fallback_now_ns, out)


def extract_samples(
    document: Union[str, bytes, dict, list],
    options: Union[ExtractorOptions, ExtractionPlan, None] = None,
    *,
    fallback_now_ns: Optional[int] = None,
    parse_float=None,
    parse_int=None,
    parse_options=None,
) -> "list[Sample]":
    """Extract time-series samples from one JSON document (document-order
    list; materialized, not lazy — documents are small and the hot path
    wants ``len``/``extend``).

    ``document`` may be JSON text (``GetSamples(string, ...)``,
    ``TimeSeriesExtractor.cs:356-359``) or an already-parsed value
    (``GetSamples(JsonElement, ...)``, ``:382-402``).  Pass a pre-built
    :class:`ExtractionPlan` in hot loops to skip per-call compilation.

    ``fallback_now_ns`` deterministically replaces the wall-clock
    "current time" fallback (``TimestampSource.CURRENT_TIME``); it does not
    override a configured ``get_default_timestamp`` provider.
    """
    if isinstance(options, ExtractionPlan):
        plan = options
    else:
        plan = ExtractionPlan(options if options is not None else ExtractorOptions())
    if isinstance(document, (str, bytes)):
        # parse_options (or the legacy parse_float / parse_int hooks): the
        # engine twin of the reference's JsonSerializerOptions argument
        # (``GetSamples(string, ..., JsonSerializerOptions)``,
        # ``TimeSeriesExtractor.cs:356-359``) — comment handling, trailing
        # commas, max depth, number hooks (functions/jsonio.py).
        if parse_options is not None:
            from .functions.jsonio import loads_with_options

            if parse_float is not None or parse_int is not None:
                raise ValueError(
                    "pass number hooks inside parse_options, not alongside it")
            document = loads_with_options(document, parse_options)
        else:
            document = _json_loads(document, parse_float=parse_float,
                                   parse_int=parse_int)
    if plan.start_at is not None:
        document = evaluate_pointer(document, plan.start_at)
        if document is MISSING:
            return []
    out: list = []
    _samples_from_root(document, plan, fallback_now_ns, out)
    return out

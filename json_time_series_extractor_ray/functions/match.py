"""Include/exclude pointer filter system.

Re-implements the reference's three rule families and their combinator
(``TimeSeriesExtractor.cs:92-337``, ``JsonPointerMatch.cs:85-161``):

* **literal** JSON Pointer rules — exact pointer equality, plus *partial*
  (prefix) matches for container elements in recursive mode so that
  descendants can still match later (``MatchExactOrPartialJsonPointer``,
  ``TimeSeriesExtractor.cs:318-337``);
* **pattern wildcard** rules (``?`` = one char, ``*`` = any run) — a
  LINEAR-time case-folded glob walk over the whole pointer string
  (``glob_match``; no regex, no backtracking blow-up — the reference
  instead bounds its regexes with a 1 s match timeout); containers below
  the max depth always pass in recursive mode because the match is
  whole-string (``TimeSeriesExtractor.cs:160-189``);
* **MQTT-style** rules (``+`` = one segment, ``#`` = any suffix, final
  segment only) — incremental segment matching: only the final segment of
  the element pointer is tested per call because ancestors were tested on
  earlier calls (``TimeSeriesExtractor.cs:191-259``).

Rule classification happens once at construction (``JsonPointerMatch`` ctor):
a string that parses as a JSON Pointer is literal unless it contains wildcard
segments; a non-pointer string is only legal as a pattern rule.  A rule
containing both pattern and MQTT wildcards is treated as a pattern rule
(pattern checked first, ``TimeSeriesExtractor.cs:160``).

Exclude-before-include precedence: an exclude match rejects immediately;
otherwise an include match (or the absence of an include list) accepts
(``TimeSeriesExtractor.cs:112-118``).

Fidelity note: when more than 8 literal rules are supplied the reference
switches to an exact-match hash set and *skips partial container matching*
(``TimeSeriesExtractor.cs:262-281``); this engine mirrors that behaviour
bit-for-bit, quirk included.
"""

from __future__ import annotations
from dataclasses import dataclass, field

from .pointer import (
    Pointer,
    PointerParseError,
    parse_pointer,
    pointer_to_string,
    try_parse_pointer,
)

SINGLE_LEVEL_MQTT_WILDCARD = "+"
MULTI_LEVEL_MQTT_WILDCARD = "#"
SINGLE_CHARACTER_WILDCARD = "?"
MULTI_CHARACTER_WILDCARD = "*"


@dataclass(frozen=True)
class MatchRule:
    """One include/exclude rule (mirrors ``JsonPointerMatch``)."""

    raw_value: str
    pointer: Pointer | None = None
    _pattern_single: bool = field(default=False, repr=False)
    _pattern_multi: bool = field(default=False, repr=False)
    _mqtt_single: bool = field(default=False, repr=False)
    _mqtt_multi: bool = field(default=False, repr=False)

    @property
    def is_pattern_wildcard_match_rule(self) -> bool:
        return self._pattern_single or self._pattern_multi

    @property
    def is_mqtt_wildcard_match_rule(self) -> bool:
        return self._mqtt_single or self._mqtt_multi

    @property
    def is_wildcard_match_rule(self) -> bool:
        return self.is_pattern_wildcard_match_rule or self.is_mqtt_wildcard_match_rule

    @classmethod
    def parse(cls, rule: "str | Pointer | MatchRule") -> "MatchRule":
        """Classify a rule string (``JsonPointerMatch.cs:85-161``).

        Raises ``ValueError`` when the string is neither a valid JSON Pointer
        nor a pattern wildcard expression.
        """
        if isinstance(rule, MatchRule):
            return rule
        if isinstance(rule, tuple):
            return cls._from_pointer(rule)
        ptr = try_parse_pointer(rule)
        if ptr is not None:
            return cls._from_pointer(ptr, raw=rule)
        # Not a valid pointer: only legal as a pattern wildcard expression.
        p_single = SINGLE_CHARACTER_WILDCARD in rule
        p_multi = MULTI_CHARACTER_WILDCARD in rule
        if not (p_single or p_multi):
            raise ValueError(
                f"{rule!r} is not a valid JSON pointer or pattern wildcard expression"
            )
        return cls(raw_value=rule, pointer=None,
                   _pattern_single=p_single, _pattern_multi=p_multi)

    @classmethod
    def _from_pointer(cls, ptr: Pointer, raw: str | None = None) -> "MatchRule":
        # Per-segment classification: '+' anywhere = MQTT single-level; '#' in
        # the final segment = MQTT multi-level; otherwise '?'/'*' inside a
        # segment = pattern wildcard.  A '#' in a non-final segment is a plain
        # literal segment (JsonPointerMatch.cs:100-115).
        mqtt_single = mqtt_multi = p_single = p_multi = False
        last = len(ptr) - 1
        for i, segment in enumerate(ptr):
            if segment == SINGLE_LEVEL_MQTT_WILDCARD:
                mqtt_single = True
            elif i == last and segment == MULTI_LEVEL_MQTT_WILDCARD:
                mqtt_multi = True
            elif SINGLE_CHARACTER_WILDCARD in segment:
                p_single = True
            elif MULTI_CHARACTER_WILDCARD in segment:
                p_multi = True
        return cls(raw_value=raw if raw is not None else pointer_to_string(ptr),
                   pointer=ptr,
                   _pattern_single=p_single, _pattern_multi=p_multi,
                   _mqtt_single=mqtt_single, _mqtt_multi=mqtt_multi)


def _is_container(element) -> bool:
    return isinstance(element, (dict, list))


def _match_exact_or_partial(ctx, match_ptr: Pointer, element_ptr: Pointer, element) -> bool:
    """Literal rule match (``TimeSeriesExtractor.cs:318-337``)."""
    if match_ptr == element_ptr:
        return True
    if (
        ctx.options.recursive
        and _is_container(element)
        and len(element_ptr) < len(match_ptr)
    ):
        return element_ptr == match_ptr[: len(element_ptr)]
    return False


def glob_match(pattern: str, text: str) -> bool:
    """Full-string wildcard match (``*`` any run incl. empty, ``?`` one
    char) via the classic two-pointer walk with star backtracking —
    worst case O(|pattern| x |text|) time, O(1) space, NEVER the
    exponential backtracking a naive ``.*`` regex translation risks.
    The reference bounds that failure mode with a 1-second regex match
    timeout (``TimeSeriesExtractor.cs:58-66,163-176``); a polynomial
    matcher makes the timeout unnecessary.  Callers case-fold both
    arguments for the reference's IgnoreCase semantics."""
    np_, nt = len(pattern), len(text)
    pi = si = 0
    star = -1
    mark = 0
    while si < nt:
        if pi < np_ and (pattern[pi] == SINGLE_CHARACTER_WILDCARD
                         or pattern[pi] == text[si]):
            pi += 1
            si += 1
        elif pi < np_ and pattern[pi] == MULTI_CHARACTER_WILDCARD:
            star = pi
            mark = si
            pi += 1
        elif star != -1:
            # re-expand the last '*' by one character and retry
            pi = star + 1
            mark += 1
            si = mark
        else:
            return False
    while pi < np_ and pattern[pi] == MULTI_CHARACTER_WILDCARD:
        pi += 1
    return pi == np_


def _compile_pattern_predicate(raw_value: str):
    """Pattern wildcard rule (``TimeSeriesExtractor.cs:160-189``):
    linear-time ``glob_match`` against the case-folded pointer string."""
    pat = raw_value.casefold()

    def predicate(ctx, element_ptr: Pointer, element) -> bool:
        # Containers below the max depth always pass in recursive mode: the
        # pattern matches the whole pointer string, so pruning early would
        # drop descendants that could match (TimeSeriesExtractor.cs:177-187).
        if (
            ctx.options.recursive
            and len(ctx.element_stack) < ctx.max_depth
            and _is_container(element)
        ):
            return True
        return glob_match(pat, pointer_to_string(element_ptr).casefold())

    return predicate


def _compile_mqtt_predicate(match_ptr: Pointer):
    """MQTT-style rule (``TimeSeriesExtractor.cs:191-259``)."""
    segments = tuple(
        (
            seg,
            seg == SINGLE_LEVEL_MQTT_WILDCARD,
            i == len(match_ptr) - 1 and seg == MULTI_LEVEL_MQTT_WILDCARD,
        )
        for i, seg in enumerate(match_ptr)
    )
    n_match = len(segments)
    last_is_multi = segments[-1][2] if segments else False

    def predicate(ctx, element_ptr: Pointer, element) -> bool:
        n_ptr = len(element_ptr)
        if n_ptr < n_match:
            # Partial match: only containers in recursive mode within the raw
            # MaxDepth limit can stay alive (the stack always holds the root,
            # hence '>' not '>=': TimeSeriesExtractor.cs:206-222).
            if not ctx.options.recursive:
                return False
            if not _is_container(element):
                return False
            if ctx.options.max_depth >= 1 and len(ctx.element_stack) > ctx.options.max_depth:
                return False
        longer = n_ptr > n_match
        if longer and not last_is_multi:
            return False
        # Only the final segment needs testing; ancestors were tested on
        # earlier calls during traversal (TimeSeriesExtractor.cs:234-242).
        idx = n_ptr - 1
        seg, is_single, is_multi = segments[-1] if idx >= n_match else segments[idx]
        if is_single:
            return not (longer and idx >= n_match)
        if is_multi:
            return True
        return element_ptr[idx] == seg

    return predicate


def _compile_rule_list(rules, allow_wildcards: bool):
    """Compile one side (include or exclude) into a single predicate.

    Mirrors ``CreateJsonPointerMatchDelegateCore``
    (``TimeSeriesExtractor.cs:140-290``) including the >8-literal-rules
    hash-set fast path that skips partial matching.
    """
    literal_pointers: list[Pointer] = []
    wildcard_predicates = []
    for rule in rules:
        rule = MatchRule.parse(rule)
        if rule.pointer is None and not (rule.raw_value or "").strip():
            continue
        if not allow_wildcards or not rule.is_wildcard_match_rule:
            literal_pointers.append(rule.pointer)
            continue
        if rule.is_pattern_wildcard_match_rule:
            wildcard_predicates.append(_compile_pattern_predicate(rule.raw_value))
        else:
            wildcard_predicates.append(_compile_mqtt_predicate(rule.pointer))

    literal_set = set(literal_pointers) if len(literal_pointers) > 8 else None

    def predicate(ctx, element_ptr: Pointer, element) -> bool:
        if literal_set is not None:
            if element_ptr in literal_set:
                return True
        elif literal_pointers:
            for p in literal_pointers:
                if _match_exact_or_partial(ctx, p, element_ptr, element):
                    return True
        for pred in wildcard_predicates:
            if pred(ctx, element_ptr, element):
                return True
        return False

    return predicate


def make_pointer_filter(include=None, exclude=None, allow_wildcards: bool = False):
    """Build a ``can_process_element(ctx, pointer, element)`` callable.

    Mirrors ``CreateJsonPointerMatchDelegate`` (``TimeSeriesExtractor.cs:92-119``):
    exclude match -> reject; otherwise include-list match (or no include
    list) -> accept.  Rules are compiled once here, so per-worker
    construction cost is paid in actor ``__init__``.
    """
    include_pred = _compile_rule_list(include, allow_wildcards) if include is not None else None
    exclude_pred = _compile_rule_list(exclude, allow_wildcards) if exclude is not None else None

    if include_pred is None and exclude_pred is None:
        return lambda ctx, ptr, element: True

    def can_process(ctx, ptr: Pointer, element) -> bool:
        if exclude_pred is not None and exclude_pred(ctx, ptr, element):
            return False
        return include_pred is None or include_pred(ctx, ptr, element)

    return can_process

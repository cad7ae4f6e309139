"""Best-effort interpreter for pickled ``sic`` normalizer payloads.

The reference persists, per normalization unit, the ``.data`` attribute of a
``sic`` normalizer (model.py:117-125) and restores it verbatim on load
(model.py:160-167) — the rule content (case folding, token/character
replacement, token splits: the same public rule surface our
:mod:`pilsner_spark.core.normalize` reimplements, see sic's PyPI docs and
the reference's ``add_normalizer`` which feeds ``make_tokenizer`` XML built
from ``sic.ReplaceCharacter(...).decode()`` fragments, model.py:198-207)
travels inside that payload. Interpreting it makes model migration
zero-config: no caller-supplied tokenizer XML needed.

``sic`` itself cannot be installed in this environment, so this module is
deliberately schema-flexible rather than bound to one private layout:

* :func:`tolerant_pickle_load` unpickles files even when payloads contain
  ``sic.*`` class instances (the package is absent): unknown sic classes
  are materialized as dict-backed stand-ins that preserve the class NAME
  (which identifies the rule kind: ReplaceToken / ReplaceCharacter /
  SplitToken) and the pickled state.
* :func:`parse_sic_payload` walks any nested payload structure and
  extracts what it can recognize: embedded tokenizer-XML strings (parsed
  exactly), case-sensitivity settings, and rule records carried as
  mappings or stand-in instances with from/to/where-style fields.

Unknown shapes return ``None`` — the importer then degrades to the bypass
normalizer and REPORTS the degradation (never silent). This is explicitly
best-effort coverage of the public rule surface, not a claim to parse
every historical sic build.
"""

from __future__ import annotations

import io
import pickle
import re
from typing import Any, List, Optional, Tuple

from pilsner_spark.core.normalize import (
    RESERVED_CHARS,
    NormalizerConfig,
    Rule,
    normalizer_from_xml_string,
)

_RESERVED = set(RESERVED_CHARS)


class SicStandIn(dict):
    """Dict-backed stand-in for an unpicklable ``sic.*`` class instance.

    Pickle state (attribute dict and/or dict items) lands in the mapping;
    the original class name is kept on ``sic_class`` for rule-kind
    detection."""

    sic_class = ""

    def __setstate__(self, state):  # instance attrs -> mapping entries
        if isinstance(state, tuple):  # (dict state, slots state)
            for part in state:
                if isinstance(part, dict):
                    self.update(part)
        elif isinstance(state, dict):
            self.update(state)


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that substitutes stand-ins for missing ``sic`` classes."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._standins = {}

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            if module.split(".")[0] != "sic":
                raise
            key = (module, name)
            if key not in self._standins:
                self._standins[key] = type(name, (SicStandIn,), {"sic_class": name})
            return self._standins[key]


def tolerant_pickle_load(f) -> Any:
    return _TolerantUnpickler(f).load()


def tolerant_pickle_loads(data: bytes) -> Any:
    return tolerant_pickle_load(io.BytesIO(data))


# -- payload interpretation --------------------------------------------------

_XML_FRAGMENT = re.compile(r"<\s*(tokenizer|token|split|character|setting)\b")
_FROM_KEYS = ("from", "value_from", "frm", "search", "old", "what")
_TO_KEYS = ("to", "value_to", "replace", "replacement", "new")
_WHERE_KEYS = ("where", "position", "anchor")
_VALUE_KEYS = ("value",)
_CS_KEYS = ("cs", "case_sensitive", "casesensitive")
_BYPASS_KEYS = ("bypass",)
_KIND_BY_CLASS = {
    "replacetoken": "token",
    "replacecharacter": "character",
    "splittoken": "split",
    "token": "token",
    "character": "character",
    "split": "split",
}
_FALSY = (0, "0", False, "false", "False")
_TRUTHY = (1, "1", True, "true", "True")


def _norm_key(k: Any) -> str:
    return str(k).lstrip("~_").lower() if isinstance(k, (str, bytes)) else ""


def _get_first(items: dict, keys) -> Optional[str]:
    for k in keys:
        if k in items and isinstance(items[k], str):
            return items[k]
    return None


def _as_text(v: Any) -> Optional[str]:
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf8")
        except UnicodeDecodeError:
            return None
    return None


class _Extractor:
    def __init__(self) -> None:
        self.rules: List[Rule] = []
        self.lowercase: Optional[bool] = None
        self.bypass = False
        self.found_any = False
        self._seen: set = set()

    def _add_rule(self, rule: Rule) -> None:
        if rule.frm in _RESERVED:
            return  # pilsner's appended control-char strip rules: implicit here
        if rule not in self.rules:
            self.rules.append(rule)
        self.found_any = True

    def _try_xml(self, text: str) -> bool:
        if not _XML_FRAGMENT.search(text):
            return False
        doc = text if "<tokenizer" in text else f"<tokenizer name='imported'>{text}</tokenizer>"
        try:
            cfg = normalizer_from_xml_string(doc)
        except Exception:
            return False
        if cfg.lowercase:
            self.lowercase = True
        if cfg.bypass:
            self.bypass = True
        for r in cfg.rules:
            self._add_rule(r)
        self.found_any = True
        return True

    def _try_rule_record(self, items: dict, class_hint: str) -> bool:
        """A mapping that looks like one replacement rule."""
        frm = _get_first(items, _FROM_KEYS)
        to = _get_first(items, _TO_KEYS)
        value = _get_first(items, _VALUE_KEYS)
        where = _get_first(items, _WHERE_KEYS)
        kind = _KIND_BY_CLASS.get(class_hint.lower(), None)
        if kind == "split" or (kind is None and where and (value or frm)):
            v = value or frm
            if v:
                self._add_rule(Rule(kind="split", frm=v, where=(where or "lmr")))
                return True
            return False
        if frm is None or to is None:
            return False
        if kind is None:
            kind = "character" if len(frm) == 1 and len(to) <= 1 else "token"
        self._add_rule(Rule(kind=kind, frm=frm, to=to))
        return True

    def walk(self, obj: Any) -> None:
        oid = id(obj)
        if oid in self._seen:
            return
        if isinstance(obj, (dict, list, tuple, set, frozenset)):
            self._seen.add(oid)
        text = _as_text(obj)
        if text is not None:
            self._try_xml(text)
            return
        if isinstance(obj, dict):
            items = {_norm_key(k): v for k, v in obj.items()}
            for k in _CS_KEYS:
                if k in items and items[k] in _FALSY:
                    self.lowercase = True
                    self.found_any = True
                elif k in items and items[k] in _TRUTHY and self.lowercase is None:
                    self.lowercase = False
                    self.found_any = True
            for k in _BYPASS_KEYS:
                if k in items and items[k] in _TRUTHY:
                    self.bypass = True
                    self.found_any = True
            class_hint = getattr(obj, "sic_class", "") or str(items.get("type") or items.get("kind") or "")
            if self._try_rule_record(items, class_hint):
                return
            for v in obj.values():
                self.walk(v)
            return
        if isinstance(obj, (list, tuple, set, frozenset)):
            for v in obj:
                self.walk(v)


def parse_sic_payload(payload: Any) -> Tuple[Optional[NormalizerConfig], str]:
    """Interpret one unit's pickled ``.data`` payload.

    Returns ``(config, status)``: ``('parsed', cfg)`` when recognizable
    rule content was found, ``(None, 'opaque')`` when nothing was — the
    caller should degrade to bypass AND report it."""
    if isinstance(payload, NormalizerConfig):  # round-trip of our own config
        return payload, "parsed"
    ex = _Extractor()
    ex.walk(payload)
    if not ex.found_any:
        return None, "opaque"
    cfg = NormalizerConfig(
        name="imported",
        lowercase=bool(ex.lowercase),
        bypass=ex.bypass and not ex.rules,
        rules=tuple(ex.rules),
    )
    return cfg, "parsed"

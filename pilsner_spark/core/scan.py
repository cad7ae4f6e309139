"""Leftmost-longest dictionary span matching (pilsner scan semantics).

Reimplements the observable semantics of the reference's character-trie scan
(``Utility.spot_entities``, /root/reference/pilsner/utility.py:399-521) with
a different machine: a **token-indexed matcher**. Dictionary labels are
grouped by their first token; at every word start the candidate list for the
text's first token is probed longest-first with C-speed ``str.startswith``.
This keeps the broadcast payload tiny (just the label strings) and avoids a
per-character Python loop.

Semantics reproduced exactly (golden: ut_utility.py:257-263, 402-437):

* matches begin at a word start (string start or right after a separator)
  and end at a separator or end-of-string;
* longest match at a word start wins; a shorter label ending at an earlier
  internal separator is committed when every longer candidate fails
  (the reference's ``shorter_alternative`` fallback, utility.py:466-497);
* after a committed match, scanning resumes past its end;
* when an attempted multi-word walk fails without any committable match,
  scanning resumes right after the first separator the walk crossed
  (the reference's ``temporary_index`` resume, utility.py:472-503);
* a match ending exactly at end-of-string reports ``end = len(text) - 1``
  (one less than the exclusive end; reference quirk at utility.py:512 —
  golden evidence: flatten_layers fixture span (47,72) for a 73-char-suffix
  match, ut_utility.py:322/364);
* labels flagged ignored are never committed but still participate in the
  walk (``ignore_node`` semantics, utility.py:128-149, 466/479/508).

Known deviation (documented, intentional): the reference keeps a stale
``temporary_index`` across a failure-at-separator and can jump the cursor
backwards on a later mid-word failure; this formulation instead attempts
every word start outside committed matches. The divergence is only
observable with overlapping multi-word labels engineered to fail twice in
one region; none of the reference's own tests exercise it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass
class _Entry:
    label: str
    ids: List[int]
    ignored: bool = False


@dataclass
class TokenIndexedMatcher:
    """Immutable-after-build matcher over normalized dictionary labels."""

    word_separator: str = " "
    # first token -> entries sorted by label length descending
    index: Dict[str, List[_Entry]] = field(default_factory=dict)
    # full label -> entry (for updates / ignore flags)
    by_label: Dict[str, _Entry] = field(default_factory=dict)

    def add(self, label: str, line_id: int) -> None:
        """Register one normalized label for one dictionary line."""
        if not label:
            return
        entry = self.by_label.get(label)
        if entry is not None:
            entry.ids.append(line_id)
            return
        entry = _Entry(label=label, ids=[line_id])
        self.by_label[label] = entry
        first = label.split(self.word_separator, 1)[0]
        bucket = self.index.setdefault(first, [])
        # keep bucket sorted by length descending (stable for equal lengths)
        pos = 0
        for pos in range(len(bucket) + 1):  # small buckets; linear is fine
            if pos == len(bucket) or len(bucket[pos].label) < len(label):
                break
        bucket.insert(pos, entry)

    def remove(self, label: str) -> bool:
        """Delete a label entirely (reference remove_node, utility.py:103)."""
        entry = self.by_label.pop(label, None)
        if entry is None:
            return False
        first = label.split(self.word_separator, 1)[0]
        bucket = self.index.get(first, [])
        self.index[first] = [e for e in bucket if e.label != label]
        if not self.index[first]:
            del self.index[first]
        return True

    def set_ignored(self, label: str, ignored: bool = True) -> bool:
        """Suppress a label from recognition without removing it
        (reference ignore_node, utility.py:128-149)."""
        entry = self.by_label.get(label)
        if entry is None:
            return False
        entry.ignored = ignored
        return True

    def scan(self, text: str) -> List[Tuple[List[int], str, int, int]]:
        """Find dictionary spans in *text* (already normalized).

        Returns [(line_ids, label, begin, end)] in left-to-right commit
        order; offsets are into *text* (normalized coordinates), ``end``
        follows the reference's conventions described in the module doc.
        """
        sep = self.word_separator
        n = len(text)
        out: List[Tuple[List[int], str, int, int]] = []
        pos = 0
        while pos < n:
            if text[pos] == sep:
                pos += 1
                continue
            tok_end = text.find(sep, pos)
            if tok_end < 0:
                tok_end = n
            bucket = self.index.get(text[pos:tok_end])
            committed = False
            first_crossed_sep = -1
            if bucket:
                max_walk = 0  # longest common prefix with any candidate
                for entry in bucket:
                    label = entry.label
                    length = len(label)
                    if text.startswith(label, pos):
                        boundary_end = pos + length
                        at_boundary = boundary_end == n or text[boundary_end] == sep
                        if at_boundary and not entry.ignored:
                            end = n - 1 if boundary_end == n else boundary_end
                            out.append((list(entry.ids), label, pos, end))
                            pos = (boundary_end if boundary_end < n else n) + 1
                            committed = True
                            break
                        # ignored or boundary-failed full match: the walk still
                        # consumed the whole label (feeds the resume position)
                        if length > max_walk:
                            max_walk = length
                    else:
                        lcp = _common_prefix_len(text, pos, label)
                        if lcp > max_walk:
                            max_walk = lcp
                if not committed and max_walk > 0:
                    s0 = text.find(sep, pos, pos + max_walk)
                    if s0 >= 0:
                        first_crossed_sep = s0
            if committed:
                continue
            if first_crossed_sep >= 0:
                pos = first_crossed_sep + 1
            else:
                pos = tok_end + 1
        return out


def _common_prefix_len(text: str, pos: int, label: str) -> int:
    """Length of the common prefix of text[pos:] and label."""
    limit = min(len(text) - pos, len(label))
    lo = 0
    while lo < limit and text[pos + lo] == label[lo]:
        lo += 1
    return lo

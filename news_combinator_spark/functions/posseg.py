"""POS tagging for out-of-vocabulary words via the reference's
committed joint boundary+POS HMM.

The reference commits the 4-file model at
reconstruction/category/dict/pos_dict/{char_state_tab,prob_emit,
prob_start,prob_trans}.utf8 — the jieba.posseg model its own example
exercises (chnsegmt/jieba_example/jb_f4_posseg.py). States are
(B/M/E/S, pos) pairs (the file headers document the Cartesian
product); cppjieba's PosTagger.hpp tags dictionary words from the
dict and leaves OOV words at 'x', while jieba.posseg runs this model
over unrecognized spans to give them a real tag. This module is the
posseg half: `tag_word` scores a single already-segmented OOV word.

Because the committed transition table only ever moves within one
pos (B,t -> {M,t | E,t}, M,t -> {M,t | E,t}), a word-shaped path
(B M* E, or S alone) carries ONE pos end to end, so the restricted
Viterbi decomposes into an exact per-tag score:

  len 1:  start(S,t) + emit(S,t,c0)
  len n:  start(B,t) + emit(B,t,c0) + trans(B,t -> M|E)
          + interior M emissions/transitions + emit(E,t,c_last)

Candidate tags are restricted by char_state_tab (the model's
per-char allowed-state sets), falling back to all tags for chars the
table has never seen. Missing emissions score MIN_FLOAT like the
model files' own -3.14e+100 sentinel.

Clean-room: written from the committed files' self-documenting
headers; no jieba/cppjieba code consulted beyond the reference's
committed sources.
"""

from __future__ import annotations

import os

MIN_FLOAT = -3.14e100

_ENV_POSDICT = "NC_SPARK_POSSEG_DIR"


def _parse_state(s: str) -> tuple[str, str]:
    b, _, t = s.partition(",")
    return b, t


class PossegModel:
    """The committed pos_dict model, loaded once per process."""

    def __init__(self, dirpath: str, encoding: str = "utf-8"):
        def lines(name):
            with open(os.path.join(dirpath, name), encoding=encoding) as f:
                for ln in f:
                    ln = ln.strip()
                    if ln and not ln.startswith("#"):
                        yield ln

        self.start: dict[tuple[str, str], float] = {}
        for ln in lines("prob_start.utf8"):
            st, _, v = ln.rpartition(":")
            self.start[_parse_state(st)] = float(v)

        # trans[(b1,t)][(b2,t)] = logp. WITHIN-word transitions
        # (B->M/E, M->M/E) never change t in the committed table —
        # the invariant the per-tag decomposition relies on (asserted
        # below); cross-word transitions (E->B/S, S->B/S) do change t
        # but a single word's path never takes one.
        self.trans: dict[tuple[str, str], dict[tuple[str, str], float]] = {}
        for ln in lines("prob_trans.utf8"):
            s1, s2, v = ln.split(":")
            a, b = _parse_state(s1), _parse_state(s2)
            if a[0] in ("B", "M"):
                assert a[1] == b[1], f"cross-pos within-word {ln!r}"
            self.trans.setdefault(a, {})[b] = float(v)

        self.emit: dict[tuple[str, str], dict[str, float]] = {}
        for ln in lines("prob_emit.utf8"):
            st, _, pairs = ln.partition(":")
            d: dict[str, float] = {}
            for pair in pairs.split(";"):
                ch, _, v = pair.partition(",")
                if ch and v:
                    d[ch] = float(v)
            self.emit[_parse_state(st)] = d

        # char -> set of allowed (B/M/E/S, pos) states
        self.char_states: dict[str, frozenset[tuple[str, str]]] = {}
        for ln in lines("char_state_tab.utf8"):
            ch, _, states = ln.partition(":")
            if not ch:
                continue
            self.char_states[ch] = frozenset(
                _parse_state(s) for s in states.split(";") if s
            )

        self.all_tags = sorted({t for _, t in self.start})

    def _allowed_tags(self, ch: str, b: str) -> set[str]:
        st = self.char_states.get(ch)
        if st is None:
            return set(self.all_tags)
        return {t for bb, t in st if bb == b}

    def _e(self, b: str, t: str, ch: str) -> float:
        return self.emit.get((b, t), {}).get(ch, MIN_FLOAT)

    def _tr(self, b1: str, b2: str, t: str) -> float:
        return self.trans.get((b1, t), {}).get((b2, t), MIN_FLOAT)

    def tag_word(self, word: str) -> str:
        """Best pos for `word` treated as exactly one word (the
        segmenter already fixed its boundary): S path for a single
        char, B M* E path otherwise."""
        if not word:
            return "x"
        if len(word) == 1:
            cand = self._allowed_tags(word[0], "S")
            scored = [
                (self.start.get(("S", t), MIN_FLOAT)
                 + self._e("S", t, word[0]), t)
                for t in cand
            ]
        else:
            first, last, mid = word[0], word[-1], word[1:-1]
            cand = self._allowed_tags(first, "B") & self._allowed_tags(
                last, "E"
            )
            if not cand:
                cand = self._allowed_tags(first, "B") or set(self.all_tags)
            scored = []
            for t in cand:
                s = self.start.get(("B", t), MIN_FLOAT) + self._e(
                    "B", t, first
                )
                if mid:
                    s += self._tr("B", "M", t)
                    s += sum(self._e("M", t, c) for c in mid)
                    s += self._tr("M", "M", t) * (len(mid) - 1)
                    s += self._tr("M", "E", t)
                else:
                    s += self._tr("B", "E", t)
                s += self._e("E", t, last)
                scored.append((s, t))
        if not scored:
            return "x"
        # deterministic: best score, tag asc on ties
        best = max(scored, key=lambda p: (p[0], [-ord(c) for c in p[1]]))
        return best[1] if best[0] > MIN_FLOAT else "x"


_CACHED: "PossegModel | None" = None
_CACHED_KEY: str | None = None


def configure_pos_model(dirpath: str) -> None:
    """Install the pos_dict directory process-wide (env var, so Arrow
    workers rebuild it lazily) and reset the cache."""
    os.environ[_ENV_POSDICT] = dirpath
    global _CACHED, _CACHED_KEY
    _CACHED, _CACHED_KEY = None, None


def clear_pos_model() -> None:
    os.environ.pop(_ENV_POSDICT, None)
    global _CACHED, _CACHED_KEY
    _CACHED, _CACHED_KEY = None, None


def snapshot_config() -> str | None:
    """Driver-side snapshot for UDF closures (see
    chnseg.snapshot_config for why env vars alone don't reach
    already-spawned executor workers)."""
    return os.environ.get(_ENV_POSDICT)


def apply_config(dirpath: str | None) -> None:
    if dirpath:
        os.environ[_ENV_POSDICT] = dirpath


def get_pos_model() -> PossegModel | None:
    global _CACHED, _CACHED_KEY
    dirpath = os.environ.get(_ENV_POSDICT)
    if not dirpath:
        return None
    if _CACHED_KEY == dirpath:
        return _CACHED
    if not os.path.isdir(dirpath):
        return None
    _CACHED = PossegModel(dirpath)
    _CACHED_KEY = dirpath
    return _CACHED

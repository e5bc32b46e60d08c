"""Dictionary-based Chinese segmentation: the public MP-DAG + HMM
"Mix" algorithm, clean-room.

Re-expresses the behavior of the reference engine's segmenter
(reconstruction/category/src/MixSegment.hpp:34-86 — MP cut, then every
run of consecutive single-char words re-cut by HMM;
MPSegment.hpp:82-150 — DAG over dictionary words + right-to-left
max-log-prob DP, out-of-dict fragments weighted at the dictionary's
minimum log-frequency, strict-greater tie rule over end positions
ascending; HMMSegment.hpp:64-117,144-205 — BEMS Viterbi with ASCII
runs (< 0x80) passed through whole, final state = argmax(E, S) with E
winning ties, words closed at E/S states; DictTrie.hpp:150-215 —
`word freq tag` lines, weight = log(freq / sum(freq))).

No dictionary data ships with this repo: callers supply paths to a
frequency dictionary and a BEMS HMM model file (9 effective lines:
start probs, 4x4 transition rows in B,E,M,S order, then 4
`char:logp,...` emission maps). The reference checkout commits such
files (reconstruction/category/dict/extra_dict/jieba.dict.small.utf8
and dict/hmm_model.utf8); the parity tests load them from there when
present and skip otherwise.

Engine integration: `configure_dictionary()` exports the paths via
environment variables so Arrow-UDF worker processes (which re-import
this module) lazily build their own cached segmenter. Call it BEFORE
building the SparkSession: local-mode python workers snapshot the
driver environment at JVM launch and are reused
(spark.python.worker.reuse), so later reconfiguration does not reach
already-spawned workers. On a real cluster, ship the dict with
`--files` and set the two env vars via `spark.executorEnv.*`; the
per-process load (~110k words, ~0.3 s) amortizes over the executor
lifetime.
"""

from __future__ import annotations

import math
import os

MIN_DOUBLE = -3.14e100
_B, _E, _M, _S = 0, 1, 2, 3

_ENV_DICT = "NC_SPARK_CHNSEG_DICT"
_ENV_HMM = "NC_SPARK_CHNSEG_HMM"
_ENV_ENC = "NC_SPARK_CHNSEG_ENCODING"
_ENV_USER = "NC_SPARK_CHNSEG_USERDICT"

_CACHED: "MixSegmenter | None" = None
_CACHED_KEY: tuple[str, str] | None = None


class MixSegmenter:
    """MP (max-probability DAG) + HMM mix segmentation over a
    user-supplied frequency dictionary."""

    def __init__(self, dict_path: str, hmm_path: str,
                 encoding: str = "utf-8"):
        # `encoding` covers both files: the reference commits the FULL
        # production dictionary only in GBK (reconstruction/category/
        # dict/gbk_dict/jieba.dict.gbk + hmm_model.gbk, cppjieba's
        # loader reads GBK natively); passing encoding="gbk" loads it
        # without a conversion step or shipping converted data.
        total = 0.0
        entries: list[tuple[str, float]] = []
        self.tags: dict[str, str] = {}
        with open(dict_path, encoding=encoding) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                try:
                    fr = float(parts[1])
                except ValueError:
                    continue
                if fr <= 0:  # log(fr/total) must be finite
                    continue
                entries.append((parts[0], fr))
                total += fr
                self.tags[parts[0]] = parts[2] if len(parts) > 2 else "x"
        if not entries or total <= 0:
            # fail at construction with a clear message — otherwise
            # every Arrow worker that lazily rebuilds the segmenter
            # dies with an opaque min()/log() error per task
            raise ValueError(
                f"dictionary {dict_path!r} has no parseable "
                "'word freq [tag]' entries (empty or malformed file)"
            )
        # raw counts kept alongside the precomputed log-probs: a
        # user-dict overlay (load_userdict/add_word below) changes the
        # grand total, which shifts EVERY path score by
        # n_segments * log(old/new) — exactly as in jieba, where calc()
        # recomputes log(freq) - log(total) per query — so overlays
        # rebuild the log table from the raw counts.
        self._raw: dict[str, float] = dict(entries)
        self._rebuild()
        self._load_hmm(hmm_path, encoding)

    def _rebuild(self) -> None:
        total = sum(self._raw.values())
        self.total = total
        self.words = {
            w: math.log(fr / total) for w, fr in self._raw.items()
        }
        self.min_weight = min(self.words.values())
        self.max_len = max(len(w) for w in self._raw)
        self.prefixes: set[str] = set()
        for w in self._raw:
            for i in range(1, len(w)):
                self.prefixes.add(w[:i])

    # -- user-dict overlay (F11 vocabulary gaps; VERDICT r3 #5) ----------
    def suggest_freq(self, word: str) -> int:
        """The minimal integer frequency that makes ``word`` win its
        own MP cut — jieba's public ``suggest_freq(segment)`` formula:
        the product of the current cut pieces' unigram probabilities,
        scaled back to a count, plus one."""
        p = 1.0
        for seg in self.cut(word):
            p *= self._raw.get(seg, 1.0) / self.total
        return max(int(p * self.total) + 1, int(self._raw.get(word, 0)) + 1)

    def add_word(
        self, word: str, freq: float | None = None, tag: str | None = None
    ) -> None:
        """jieba's public ``add_word``: insert/override one dictionary
        entry (freq defaults to suggest_freq so the word wins its own
        segmentation) and rebuild the probability table."""
        if freq is None:
            freq = self.suggest_freq(word)
        if freq <= 0:
            raise ValueError(f"add_word({word!r}): freq must be > 0")
        self._raw[word] = float(freq)
        if tag:
            self.tags[word] = tag
        self._rebuild()

    def load_userdict(self, src, encoding: str = "utf-8") -> int:
        """jieba's public ``load_userdict``: overlay 'word [freq]
        [tag]' lines from a path or an iterable of lines — the exact
        mechanism the reference itself demonstrates
        (chnsegmt/jieba_example/jb_f2_userdict.py:6 +
        dict/userdict.txt). Omitted freqs use suggest_freq against the
        PRE-overlay distribution; one rebuild at the end (a batch of k
        words costs O(V), not O(kV)). Returns the number of entries
        applied. An EXPLICIT freq of 0 is jieba's public idiom for
        suppressing a word ('台中 0'): jieba keeps the entry but scores
        routes with log(freq or 1), i.e. freq 0 competes at freq 1 and
        loses to the per-char path — replicated here by storing 1.0
        (this table needs finite log weights). Only an OMITTED freq
        falls back to suggest_freq."""
        if isinstance(src, str):
            with open(src, encoding=encoding) as fh:
                raw_lines = fh.readlines()
        else:
            raw_lines = src
        pending: list[tuple[str, float | None, str | None]] = []
        for line in raw_lines:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            word, freq, tag = parts[0], None, None
            if len(parts) > 1:
                try:
                    freq = float(parts[1])
                    tag = parts[2] if len(parts) > 2 else None
                    if not math.isfinite(freq):
                        # 'word nan'/'word inf': a non-finite weight
                        # would poison every DP route comparison
                        # (NaN compares False both ways) — treat it
                        # as omitted and fall back to suggest_freq
                        freq = None
                except ValueError:
                    tag = parts[1]
            pending.append((word, freq, tag))
        resolved = [
            (
                word,
                (max(float(freq), 1.0) if freq is not None
                 else float(self.suggest_freq(word))),
                tag,
            )
            for word, freq, tag in pending
        ]
        for word, freq, tag in resolved:
            self._raw[word] = freq
            if tag:
                self.tags[word] = tag
        if resolved:
            self._rebuild()
        return len(resolved)

    def _load_hmm(self, path: str, encoding: str = "utf-8") -> None:
        lines = [
            ln.strip()
            for ln in open(path, encoding=encoding)
            if ln.strip() and not ln.lstrip().startswith("#")
        ]
        self.start = [float(x) for x in lines[0].split()]
        self.trans = [
            [float(x) for x in lines[1 + i].split()] for i in range(4)
        ]
        self.emit: list[dict[str, float]] = []
        for i in range(4):
            d: dict[str, float] = {}
            for pair in lines[5 + i].split(","):
                ch, _, v = pair.partition(":")
                if ch:
                    d[ch] = float(v)
            self.emit.append(d)

    # -- MP ---------------------------------------------------------------
    def mp_cut(self, s: str) -> list[str]:
        n = len(s)
        if n == 0:
            return []
        dp = [0.0] * (n + 1)
        pick = [1] * n
        words, prefixes, min_w = self.words, self.prefixes, self.min_weight
        for i in range(n - 1, -1, -1):
            best = MIN_DOUBLE
            best_len = 1
            # end positions ascending; strictly-greater keeps the
            # earliest candidate on ties (MPSegment.hpp:143-147)
            for j in range(i, min(n, i + self.max_len)):
                frag = s[i : j + 1]
                if j == i:
                    wt = words.get(frag, min_w)
                else:
                    wt = words.get(frag)
                    if wt is None:
                        if frag not in prefixes:
                            break
                        continue
                val = wt + (dp[j + 1] if j + 1 < n else 0.0)
                if val > best:
                    best = val
                    best_len = j - i + 1
            dp[i] = best
            pick[i] = best_len
        out = []
        i = 0
        while i < n:
            out.append(s[i : i + pick[i]])
            i += pick[i]
        return out

    # -- HMM --------------------------------------------------------------
    def hmm_cut(self, s: str) -> list[str]:
        """ASCII (< 0x80) runs pass through whole; the rest is BEMS
        Viterbi (HMMSegment.hpp:64-94)."""
        out: list[str] = []
        n = len(s)
        left = i = 0
        while i < n:
            if ord(s[i]) < 0x80:
                if left != i:
                    out.extend(self._viterbi_cut(s[left:i]))
                j = i
                while j < n and ord(s[j]) < 0x80:
                    j += 1
                out.append(s[i:j])
                left = i = j
            else:
                i += 1
        if left != n:
            out.extend(self._viterbi_cut(s[left:]))
        return out

    def _viterbi_cut(self, s: str) -> list[str]:
        n = len(s)
        if n == 0:
            return []
        start, trans, emit = self.start, self.trans, self.emit
        wt = [[MIN_DOUBLE] * 4 for _ in range(n)]
        path = [[_E] * 4 for _ in range(n)]
        for y in range(4):
            wt[0][y] = start[y] + emit[y].get(s[0], MIN_DOUBLE)
            path[0][y] = -1
        for x in range(1, n):
            for y in range(4):
                ep = emit[y].get(s[x], MIN_DOUBLE)
                best = MIN_DOUBLE
                bp = _E
                for py in range(4):
                    t = wt[x - 1][py] + trans[py][y] + ep
                    if t > best:
                        best = t
                        bp = py
                wt[x][y] = best
                path[x][y] = bp
        # E wins ties at the end (HMMSegment.hpp:192-201)
        stat = _E if wt[n - 1][_E] >= wt[n - 1][_S] else _S
        states = [0] * n
        for x in range(n - 1, -1, -1):
            states[x] = stat
            stat = path[x][stat]
        out = []
        left = 0
        for i, st in enumerate(states):
            if st % 2 == 1:  # E or S closes a word
                out.append(s[left : i + 1])
                left = i + 1
        return out

    # -- Mix --------------------------------------------------------------
    def cut(self, s: str) -> list[str]:
        """MP cut, then each maximal run of single-char words re-cut
        with HMM (MixSegment.hpp:47-86; no user dict, so every
        single-char run is eligible)."""
        words = self.mp_cut(s)
        out: list[str] = []
        i = 0
        while i < len(words):
            if len(words[i]) != 1:
                out.append(words[i])
                i += 1
                continue
            j = i
            piece: list[str] = []
            while j < len(words) and len(words[j]) == 1:
                piece.append(words[j])
                j += 1
            out.extend(self.hmm_cut("".join(piece)))
            i = j
        return out

    def tag(self, s: str) -> list[tuple[str, str]]:
        """(word, POS flag) pairs: Mix cut, then the dictionary tag per
        word, 'x' for out-of-vocabulary (PosTagger.hpp:41-66)."""
        return [(w, self.tags.get(w, "x")) for w in self.cut(s)]

    def idf_proxy(self) -> dict[str, float]:
        """-log p(w) from the dictionary's own frequencies: the
        engine's stand-in idf when the reference's idf file
        (reconstruction/category/dict/idf.utf8) is unavailable — it is
        a missing large blob in the checkout. Corpus-common words
        (high unigram frequency) get low idf, rare words high, which
        is the ranking effect the real file exists to produce."""
        return {w: -lp for w, lp in self.words.items()}

    def extract_keywords(
        self,
        text: str,
        top_k: int = 10,
        idf: dict[str, float] | None = None,
        stopwords: set[str] | None = None,
    ) -> list[str]:
        """KeywordExtractor.hpp:54-99 pipeline: Mix cut, drop
        single-char words and stopwords, weight tf x idf with
        average-idf fallback for words absent from the idf map, top-K
        by weight (deterministic word-asc tie-break standing in for
        the reference's unstable partial_sort). With no idf map the
        dictionary-frequency proxy is used (see idf_proxy)."""
        from .textfns import top_k_tags

        return top_k_tags(
            self.cut(text),
            idf if idf is not None else self.idf_proxy(),
            k=top_k,
            stopwords=stopwords,
        )


def load_stop_words(path: str) -> set[str]:
    """One stopword per line, verbatim
    (KeywordExtractor.hpp:_loadStopWordDict — no trimming beyond the
    line terminator; \\r\\n is stripped too so a CRLF-saved file does
    not leave '\\r' on every entry and silently disable filtering)."""
    with open(path, encoding="utf-8") as f:
        return {ln.rstrip("\r\n") for ln in f}


def configure_dictionary(dict_path: str, hmm_path: str,
                         encoding: str = "utf-8",
                         user_dict: str | None = None) -> None:
    """Install dictionary paths process-wide (env vars, so forked /
    re-importing Arrow workers pick them up) and reset the cache.
    encoding="gbk" loads the reference's full production dictionary
    (gbk_dict/jieba.dict.gbk + hmm_model.gbk) directly. ``user_dict``
    (always UTF-8, jieba 'word [freq] [tag]' lines) is overlaid on the
    base dictionary after load — the jb_f2_userdict.py mechanism."""
    os.environ[_ENV_DICT] = dict_path
    os.environ[_ENV_HMM] = hmm_path
    os.environ[_ENV_ENC] = encoding
    if user_dict:
        os.environ[_ENV_USER] = user_dict
    else:
        os.environ.pop(_ENV_USER, None)
    global _CACHED, _CACHED_KEY
    _CACHED, _CACHED_KEY = None, None


def clear_dictionary() -> None:
    os.environ.pop(_ENV_DICT, None)
    os.environ.pop(_ENV_HMM, None)
    os.environ.pop(_ENV_ENC, None)
    os.environ.pop(_ENV_USER, None)
    global _CACHED, _CACHED_KEY
    _CACHED, _CACHED_KEY = None, None


def snapshot_config() -> tuple[str | None, ...]:
    """Driver-side config snapshot for shipping inside a UDF closure:
    executor python workers do NOT inherit env vars set after they
    spawn, so operators capture this at plan time and `apply_config`
    it per-task (get_segmenter's key-cache makes repeat applies
    free)."""
    return (
        os.environ.get(_ENV_DICT),
        os.environ.get(_ENV_HMM),
        os.environ.get(_ENV_ENC),
        os.environ.get(_ENV_USER),
    )


def apply_config(cfg: tuple[str | None, ...]) -> None:
    dict_path, hmm_path, enc = cfg[0], cfg[1], cfg[2]
    user = cfg[3] if len(cfg) > 3 else None  # pre-overlay snapshots
    if not (dict_path and hmm_path):
        # An UNCONFIGURED snapshot must also clear: a reused python
        # worker (spark.python.worker.reuse) otherwise keeps a
        # previous query's dict/hmm env, get_segmenter() returns that
        # stale segmenter, and this query's text is silently
        # segmented with another query's dictionaries instead of
        # taking the unconfigured fallback path.
        os.environ.pop(_ENV_DICT, None)
        os.environ.pop(_ENV_HMM, None)
        os.environ.pop(_ENV_ENC, None)
        os.environ.pop(_ENV_USER, None)
        return
    os.environ[_ENV_DICT] = dict_path
    os.environ[_ENV_HMM] = hmm_path
    # Optional keys must be CLEARED when the snapshot lacks them:
    # reused python workers otherwise keep a previous query's
    # encoding/user-dict overlay and silently segment this query's
    # text with it.
    if enc:
        os.environ[_ENV_ENC] = enc
    else:
        os.environ.pop(_ENV_ENC, None)
    if user:
        os.environ[_ENV_USER] = user
    else:
        os.environ.pop(_ENV_USER, None)


def get_segmenter() -> MixSegmenter | None:
    """The configured segmenter, lazily built and cached per process;
    None when unconfigured or the files are absent."""
    global _CACHED, _CACHED_KEY
    dict_path = os.environ.get(_ENV_DICT)
    hmm_path = os.environ.get(_ENV_HMM)
    if not dict_path or not hmm_path:
        return None
    encoding = os.environ.get(_ENV_ENC, "utf-8")
    user = os.environ.get(_ENV_USER)
    key = (dict_path, hmm_path, encoding, user)
    if _CACHED_KEY == key:
        return _CACHED
    if not (os.path.exists(dict_path) and os.path.exists(hmm_path)):
        return None
    seg = MixSegmenter(dict_path, hmm_path, encoding=encoding)
    if user:
        # Fail LOUD on a configured-but-absent user dict: silently
        # caching the un-overlaid segmenter would make this worker
        # tokenize differently from the driver and from workers where
        # the file did ship (--files races) with no signal at all.
        if not os.path.exists(user):
            raise FileNotFoundError(
                f"chnseg user dict configured but missing on this "
                f"worker: {user}"
            )
        seg.load_userdict(user)
    _CACHED = seg
    _CACHED_KEY = key
    return _CACHED

"""Character-trigram language identification — the "real model" upgrade
over ``textstats.lang_id``'s stopword argmax.

Method: hashed character-trigram frequency profiles (the n-gram profile
idea of Cavnar & Trenkle, "N-Gram-Based Text Categorization", 1994, in
its dot-product/centroid form). A language profile is the L2-normalized
frequency vector of hashed trigrams over a training sample; a document
classifies to the profile with the largest dot product against its own
hashed-trigram count vector. Everything is a pure function of the bytes,
so results are deterministic across runs, partitionings, and batch sizes.

Execution shape (the part that matters at 100 TB):

* Spark side: one ``pandas_udf`` — Arrow-batched, zero driver involvement,
  profiles broadcast by closure (a few KB).
* Batch body: fully vectorized numpy. Trigram extraction concatenates the
  batch's UTF-8 bytes ONCE and reads trigram codes with a stride-tricked
  sliding window; per-document counts come from ONE ``bincount`` over
  ``doc_idx * TABLE + code``; classification is a single matrix product.
  No Python loop touches a row (the only loop is over fixed-size
  sub-chunks to bound the bincount buffer).

The embedded training samples are short generic sentences written for
this repo (not quotations); ``train_profiles`` accepts any
``{lang: [texts]}`` so real deployments can train on their own corpora.

Reference analog: none — the reference has no text analytics at all
(SURVEY.md §2.B); this extends the training-data-pipeline surface next to
textstats.py. The stopword ``lang_id`` stays as the cheap, SQL-oracled
JVM path; this operator is the accuracy path, gated by pytest properties
(determinism, batch-shape invariance, held-out accuracy) because a
rank/hash classifier is not reasonably expressible in ANSI SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: bump when the classifier algorithm or SAMPLES change — consumers that
#: cache classify_batch outputs (the driver-gate fixture oracle) key their
#: cache on this so a stale fixture can never mismatch the live code.
VERSION = 3  # r5: +zh/ja/ko CJK profiles

TABLE = 4096  # hashed trigram table size (power of two)
_CHUNK = 1024  # docs per bincount buffer: 1024 * 4096 * 8B = 32 MB


def _trigram_codes(texts: "pd.Series", table: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n_docs, rows, codes): one (doc_idx, hashed-trigram) pair per
    3-byte window that does not straddle a document boundary.

    Vectorized end-to-end: the batch's texts are lowercased and joined
    into one byte buffer; a stride-tricked window view yields every
    3-byte code; windows that straddle a document boundary are masked by
    comparing the doc index of their first and last byte. ``rows`` is
    non-decreasing (documents are concatenated in order), which lets
    callers slice per-chunk with searchsorted instead of boolean masks.
    """
    cleaned = texts.fillna("").str.lower()
    blobs = [t.encode("utf-8", "ignore") for t in cleaned]  # O(docs), not O(chars)
    lengths = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    n_docs = len(blobs)
    empty = np.empty(0, dtype=np.int64)
    if buf.size < 3:
        return n_docs, empty, empty
    # doc index of every byte position
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    # all 3-byte windows over the fused buffer
    w = np.lib.stride_tricks.sliding_window_view(buf, 3).astype(np.uint64)
    code = w[:, 0] * np.uint64(65536) + w[:, 1] * np.uint64(256) + w[:, 2]
    # splitmix-style scramble so the modulo table spreads structured text
    # (uint64 arithmetic wraps mod 2^64 by construction)
    code = code * np.uint64(0x9E3779B97F4A7C15)
    code = ((code >> np.uint64(16)) % np.uint64(table)).astype(np.int64)
    # a window starting at byte i belongs to doc d iff byte i+2 is still d
    keep = doc_of[: code.size] == doc_of[2 : 2 + code.size]
    return n_docs, doc_of[: keep.size][keep], code[keep]


def _trigram_counts(texts: "pd.Series", table: int = TABLE) -> np.ndarray:
    """(n_docs, table) float64 count matrix — the TRAINING path only
    (corpora are a few KB). The classification hot path never builds
    this dense matrix; see :func:`classify_batch`."""
    n_docs, rows, code = _trigram_codes(texts, table)
    counts = np.zeros((n_docs, table), dtype=np.float64)
    for lo in range(0, n_docs, _CHUNK):
        hi = min(lo + _CHUNK, n_docs)
        s, e = np.searchsorted(rows, (lo, hi))
        if s == e:
            continue
        fused = (rows[s:e] - lo) * table + code[s:e]
        hist = np.bincount(fused, minlength=(hi - lo) * table)
        counts[lo:hi] += hist.reshape(hi - lo, table)
    return counts


def train_profiles(
    corpus: dict[str, list[str]], table: int = TABLE
) -> dict[str, np.ndarray]:
    """L2-normalized hashed-trigram frequency profile per language.
    Deterministic for a given corpus; a profile is ``table`` float64s
    (32 KB) — broadcastable by closure."""
    out: dict[str, np.ndarray] = {}
    for lang in sorted(corpus):
        c = _trigram_counts(pd.Series(corpus[lang]), table).sum(axis=0)
        norm = float(np.sqrt((c * c).sum()))
        out[lang] = c / norm if norm > 0 else c
    return out


def classify_batch(
    texts: "pd.Series",
    profiles: dict[str, np.ndarray],
    min_score: float = 0.05,
    und: str = "und",
) -> "pd.Series":
    """Vectorized batch classification, memory-traffic-bounded.

    The cosine is computed per ``_CHUNK`` sub-block so the dense count
    matrix never exceeds ~32 MB regardless of batch size, in float32
    (counts are small integers — exact in float32), and the
    normalization divides the (chunk, L) score matrix instead of the
    (chunk, table) count matrix:  ``scores = (C @ P.T) / ||C||`` —
    identical cosine, table/L ≈ 680× less divide+copy traffic.
    Documents whose best cosine falls below ``min_score`` (too short /
    no alphabetic content) return ``und``."""
    langs = sorted(profiles)
    P = np.ascontiguousarray(
        np.stack([profiles[l] for l in langs]).T, dtype=np.float32
    )  # (table, L)
    table = P.shape[0]
    n_docs, rows, code = _trigram_codes(texts, table)
    best = np.zeros(n_docs, dtype=np.int64)
    best_score = np.zeros(n_docs, dtype=np.float32)
    for lo in range(0, n_docs, _CHUNK):
        hi = min(lo + _CHUNK, n_docs)
        s, e = np.searchsorted(rows, (lo, hi))
        if s == e:
            continue  # all-empty chunk: score 0 -> und
        fused = (rows[s:e] - lo) * table + code[s:e]
        C = (
            np.bincount(fused, minlength=(hi - lo) * table)
            .reshape(hi - lo, table)
            .astype(np.float32)
        )
        norms = np.sqrt(np.einsum("ij,ij->i", C, C))
        norms[norms == 0] = 1.0
        S = (C @ P) / norms[:, None]  # (chunk, L) cosine vs profile
        b = S.argmax(axis=1)
        best[lo:hi] = b
        best_score[lo:hi] = S[np.arange(hi - lo), b]
    arr = np.array(langs, dtype=object)[best]
    arr[best_score < min_score] = und
    return pd.Series(arr, index=texts.index)


def lang_id_ngram(
    text: Column, profiles: dict[str, np.ndarray], min_score: float = 0.05
) -> Column:
    """Column expression: Arrow-batched trigram-profile language ID.
    ``profiles`` from :func:`train_profiles` ride the UDF closure."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return classify_batch(s, profiles, min_score=min_score)

    return _udf(text)


# Embedded training samples: short generic sentences composed for this
# repository. Enough signal for trigram profiles of visually distinct
# languages; swap for real corpora via train_profiles(your_corpus).
SAMPLES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that they would meet again after the long winter months",
        "this is a simple sentence written in plain english for testing",
        "the weather today is cold and the streets are full of people",
        "we should think about what happens when the data grows larger",
        "a good engineer measures first and only then starts to optimize",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso junto al rio",
        "ella dijo que se encontrarian de nuevo despues del largo invierno",
        "esta es una frase sencilla escrita en espanol para las pruebas",
        "el tiempo hoy esta frio y las calles estan llenas de gente",
        "debemos pensar en lo que ocurre cuando los datos crecen mucho",
        "un buen ingeniero mide primero y solo despues empieza a optimizar",
        "la canción que escuchamos ayer también está en la colección nueva",
        "los niños pequeños jugaban en el jardín mientras llovía despacio",
        "¿cuándo llegará el próximo tren a la estación del centro?",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund am fluss",
        "sie sagte dass sie sich nach dem langen winter wieder treffen wuerden",
        "dies ist ein einfacher satz der auf deutsch zum testen geschrieben ist",
        "das wetter ist heute kalt und die strassen sind voller menschen",
        "wir sollten darueber nachdenken was passiert wenn die daten wachsen",
        "ein guter ingenieur misst zuerst und beginnt erst dann zu optimieren",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux pres du fleuve",
        "elle a dit qu ils se reverraient apres les longs mois d hiver",
        "ceci est une phrase simple ecrite en francais pour les essais",
        "le temps est froid aujourd hui et les rues sont pleines de monde",
        "nous devrions penser a ce qui se passe quand les donnees grandissent",
        "un bon ingenieur mesure d abord et seulement ensuite optimise",
    ],
    "it": [
        "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
        "lei disse che si sarebbero incontrati di nuovo dopo il lungo inverno",
        "questa e una frase semplice scritta in italiano per le prove",
        "il tempo oggi e freddo e le strade sono piene di gente",
        "dovremmo pensare a cosa succede quando i dati crescono molto",
        "un buon ingegnere misura prima e solo dopo comincia a ottimizzare",
    ],
    # Non-Latin script: Cyrillic. UTF-8 encodes Cyrillic as 2-byte
    # sequences whose lead bytes (0xD0/0xD1) never occur in Latin-script
    # text, so byte-trigram profiles separate scripts essentially for
    # free — this entry makes the `und` fallback meaningful for real
    # multi-script corpora instead of mislabeling Cyrillic as the
    # nearest Latin profile.
    "ru": [
        "быстрая коричневая лиса прыгает через ленивую собаку у реки",
        "она сказала что они снова встретятся после долгой зимы",
        "это простое предложение написанное по русски для проверки",
        "погода сегодня холодная и улицы полны людей",
        "мы должны подумать о том что происходит когда данные растут",
        "хороший инженер сначала измеряет и только потом оптимизирует",
    ],
    "pt": [
        "a rapida raposa marrom pula sobre o cachorro preguicoso perto do rio",
        "ela disse que eles se encontrariam de novo depois do longo inverno",
        "esta e uma frase simples escrita em portugues para os testes",
        "o tempo hoje esta frio e as ruas estao cheias de pessoas",
        "devemos pensar no que acontece quando os dados crescem muito",
        "um bom engenheiro mede primeiro e so depois comeca a otimizar",
        "a canção que ouvimos ontem também está na nova coleção",
        "as crianças pequenas brincavam no jardim enquanto chovia devagar",
        "não sabemos quando chegará o próximo comboio à estação central",
    ],
    # CJK scripts (r5, VERDICT r4 #7). UTF-8 lead bytes already separate
    # the FAMILIES for free (kana 0xE3, unified ideographs 0xE4-0xE9,
    # hangul 0xEA-0xED), so any CJK text stops falling back to `und` or a
    # Latin label; separating ja from zh inside the shared ideograph range
    # rides the kana trigrams every natural Japanese sentence carries
    # (particles は/が/を/です) plus script-local character frequencies.
    "zh": [
        "敏捷的棕色狐狸跳过河边那只懒惰的狗",
        "她说漫长的冬天结束之后他们会再次见面",
        "这是一个用中文写的简单句子用来做测试",
        "今天天气很冷街上到处都是行人",
        "我们应该考虑当数据规模变大时会发生什么",
        "优秀的工程师先进行测量然后才开始优化",
    ],
    "ja": [
        "すばやい茶色の狐は川のそばで怠け者の犬を飛び越えます",
        "彼女は長い冬が終わったらまた会いましょうと言いました",
        "これはテストのために日本語で書かれた簡単な文です",
        "今日は寒くて通りは人でいっぱいです",
        "データが大きくなったとき何が起こるかを考えるべきです",
        "良い技術者はまず測定してそれから最適化を始めます",
    ],
    "ko": [
        "빠른 갈색 여우가 강가에서 게으른 개를 뛰어넘습니다",
        "그녀는 긴 겨울이 지나면 다시 만나자고 말했습니다",
        "이것은 테스트를 위해 한국어로 쓰인 간단한 문장입니다",
        "오늘 날씨가 춥고 거리는 사람들로 가득합니다",
        "데이터가 커질 때 무슨 일이 일어나는지 생각해야 합니다",
        "좋은 엔지니어는 먼저 측정하고 그 다음에 최적화를 시작합니다",
    ],
}

"""Embedded multilingual seed corpus (FIXTURES.md F5).

Small per-language vocabularies of very common words (public knowledge),
used for three things that must share one vocabulary so the oracle and the
engine provably use identical models:

1. training the hashed-n-gram langid classifier,
2. training the char-n-gram perplexity LM,
3. generating deterministic fixture captions.

Six languages; words chosen for distinctive character-n-gram signatures
(accents/digraphs included where typical).
"""

from __future__ import annotations

import zlib

import numpy as np


def _stable_seed(*parts) -> int:
    """Process-independent seed (Python's hash() is salted per process)."""
    return zlib.crc32(repr(parts).encode("utf-8"))

VOCAB: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "was", "that", "for", "with",
        "his", "her", "they", "this", "have", "from", "one", "had", "word",
        "but", "not", "what", "all", "were", "when", "your", "can", "said",
        "there", "use", "each", "which", "she", "how", "their", "will",
        "other", "about", "out", "many", "then", "them", "these", "some",
        "would", "make", "like", "him", "into", "time", "has", "look",
        "two", "more", "write", "see", "number", "way", "could", "people",
        "than", "first", "water", "been", "call", "who", "oil", "its",
        "now", "find", "long", "down", "day", "did", "get", "come", "made",
        "may", "part", "over", "new", "sound", "take", "only", "little",
        "work", "know", "place", "year", "live", "me", "back", "give",
        "most", "very", "after", "thing", "our", "just", "name", "good",
        "sentence", "man", "think", "say", "great", "where", "help",
        "through", "much", "before", "line", "right", "too", "mean", "old",
    ),
    "de": (
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
        "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass",
        "sie", "nach", "wird", "bei", "einer", "um", "am", "sind", "noch",
        "wie", "einem", "über", "einen", "so", "zum", "war", "haben", "nur",
        "oder", "aber", "vor", "zur", "bis", "mehr", "durch", "man", "sein",
        "wurde", "sei", "ich", "ihre", "dann", "unter", "wir", "soll",
        "ihr", "alle", "wieder", "meine", "zeit", "gegen", "vom", "kann",
        "schon", "wenn", "habe", "seine", "mark", "ihren", "wohl", "dieser",
        "zwischen", "immer", "millionen", "was", "sagte", "gibt", "alles",
        "heute", "wegen", "muss", "könnte", "jahr", "zwei", "diese",
        "stadt", "welt", "land", "hand", "haus", "wasser", "straße",
        "mädchen", "jetzt", "wurde", "natürlich", "vielleicht", "großen",
    ),
    "fr": (
        "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je",
        "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au",
        "pour", "pas", "vous", "par", "sur", "faire", "plus", "dire", "me",
        "on", "mon", "lui", "nous", "comme", "mais", "pouvoir", "avec",
        "tout", "aller", "voir", "bien", "où", "sans", "tu", "ou", "leur",
        "homme", "si", "deux", "mari", "moi", "vouloir", "te", "femme",
        "venir", "quand", "grand", "celui", "savoir", "petit", "aussi",
        "même", "autre", "après", "jour", "temps", "très", "encore",
        "aucun", "chose", "notre", "trouver", "donner", "prendre", "rien",
        "peu", "votre", "parler", "jamais", "eau", "année", "toujours",
        "français", "être", "déjà", "château", "côté", "heure", "père",
        "maison", "nuit", "ville", "enfant", "monde", "beaucoup", "près",
        "garçon", "tête", "fenêtre", "hôtel", "forêt", "était", "très",
    ),
    "es": (
        "el", "la", "de", "que", "y", "a", "en", "un", "ser", "se", "no",
        "haber", "por", "con", "su", "para", "como", "estar", "tener",
        "le", "lo", "todo", "pero", "más", "hacer", "o", "poder", "decir",
        "este", "ir", "otro", "ese", "si", "me", "ya", "ver", "porque",
        "dar", "cuando", "muy", "sin", "vez", "mucho", "saber", "qué",
        "sobre", "mi", "alguno", "mismo", "yo", "también", "hasta", "año",
        "dos", "querer", "entre", "así", "primero", "desde", "grande",
        "eso", "ni", "nos", "llegar", "pasar", "tiempo", "ella", "sí",
        "día", "uno", "bien", "poco", "deber", "entonces", "poner", "cosa",
        "tanto", "hombre", "parecer", "nuestro", "tan", "donde", "ahora",
        "parte", "después", "vida", "quedar", "siempre", "creer", "hablar",
        "llevar", "dejar", "nada", "cada", "seguir", "menos", "nuevo",
        "encontrar", "niño", "señor", "mañana", "corazón", "ciudad",
    ),
    "it": (
        "il", "di", "che", "è", "e", "la", "non", "per", "in", "una",
        "mi", "sono", "ho", "ma", "lo", "ha", "le", "si", "ti", "con",
        "cosa", "se", "io", "come", "no", "ci", "questo", "qui", "hai",
        "del", "tu", "bene", "della", "da", "sei", "solo", "al", "me",
        "fatto", "stato", "essere", "fare", "lei", "mio", "perché", "anche",
        "chi", "così", "tutto", "più", "noi", "era", "quando", "detto",
        "loro", "molto", "senza", "grande", "dove", "ora", "allora",
        "niente", "casa", "tempo", "vita", "uomo", "giorno", "mano",
        "anni", "occhi", "voglio", "sempre", "due", "prima", "dopo",
        "ancora", "certo", "davvero", "signore", "già", "città", "però",
        "qualcosa", "nessuno", "stesso", "altro", "tutti", "quella",
        "momento", "parte", "mondo", "padre", "madre", "notte", "acqua",
        "ragazzo", "bambino", "strada", "parlare", "vedere", "sentire",
    ),
    "pt": (
        "o", "a", "de", "que", "e", "do", "da", "em", "um", "para", "é",
        "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
        "dos", "como", "mas", "foi", "ao", "ele", "das", "tem", "à", "seu",
        "sua", "ou", "ser", "quando", "muito", "há", "nos", "já", "está",
        "eu", "também", "só", "pelo", "pela", "até", "isso", "ela",
        "entre", "era", "depois", "sem", "mesmo", "aos", "ter", "seus",
        "quem", "nas", "me", "esse", "eles", "estão", "você", "tinha",
        "foram", "essa", "num", "nem", "suas", "meu", "às", "minha",
        "têm", "numa", "pelos", "bem", "pode", "onde", "ano", "sobre",
        "tempo", "ainda", "dia", "vida", "casa", "mundo", "coisa",
        "homem", "olhos", "água", "noite", "cidade", "criança", "coração",
        "então", "português", "não", "senhor", "menino", "cabeça",
    ),
}

LANGS: tuple[str, ...] = tuple(sorted(VOCAB))


def sentences(lang: str, n: int, seed: int, min_words: int = 6, max_words: int = 18) -> list[str]:
    """Deterministic synthetic sentences for a language (seeded sampling)."""
    rng = np.random.default_rng(_stable_seed(lang, seed, "seed_corpus"))
    vocab = VOCAB[lang]
    out = []
    for _ in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), k)]
        out.append(" ".join(words))
    return out


def gibberish(n: int, seed: int, min_len: int = 30, max_len: int = 80) -> list[str]:
    """High-perplexity strings: uniform random lowercase letters."""
    rng = np.random.default_rng(_stable_seed("gibberish", seed))
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for _ in range(n):
        k = int(rng.integers(min_len, max_len + 1))
        chars = [letters[int(i)] for i in rng.integers(0, 26, k)]
        # insert spaces every ~6 chars so token rules don't dominate
        s = "".join(
            c + (" " if (j % 7 == 6) else "") for j, c in enumerate(chars)
        ).strip()
        out.append(s)
    return out

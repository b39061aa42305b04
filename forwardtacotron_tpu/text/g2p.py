"""Built-in rule-based English grapheme-to-phoneme fallback.

Used by `to_phonemes` (cleaners.py) only when no espeak binary is
installed, so the full pipeline stays runnable in a hermetic TPU image.
Emits IPA restricted to the model inventory (symbols.py). It is a
compact longest-match rule engine with a lexicon of frequent
irregular words — not a replacement for espeak quality, but produces
stable, deterministic phoneme sequences for training and smoke tests.
"""
from __future__ import annotations

import re

# Frequent irregular words (en-us, espeak-style IPA without stress).
_LEXICON = {
    'a': 'ə', 'an': 'æn', 'the': 'ðə', 'of': 'ʌv', 'to': 'tuː',
    'and': 'ænd', 'in': 'ɪn', 'is': 'ɪz', 'it': 'ɪt', 'you': 'juː',
    'that': 'ðæt', 'he': 'hiː', 'was': 'wʌz', 'for': 'fɔːɹ',
    'are': 'ɑːɹ', 'as': 'æz', 'with': 'wɪð', 'his': 'hɪz',
    'they': 'ðeɪ', 'i': 'aɪ', 'be': 'biː', 'at': 'æt', 'one': 'wʌn',
    'have': 'hæv', 'this': 'ðɪs', 'from': 'fɹʌm', 'or': 'ɔːɹ',
    'had': 'hæd', 'by': 'baɪ', 'word': 'wɜːd', 'but': 'bʌt',
    'not': 'nɑːt', 'what': 'wʌt', 'all': 'ɔːl', 'were': 'wɜː',
    'we': 'wiː', 'when': 'wɛn', 'your': 'jʊɹ', 'can': 'kæn',
    'said': 'sɛd', 'there': 'ðɛɹ', 'use': 'juːs', 'each': 'iːtʃ',
    'which': 'wɪtʃ', 'she': 'ʃiː', 'do': 'duː', 'how': 'haʊ',
    'their': 'ðɛɹ', 'if': 'ɪf', 'will': 'wɪl', 'up': 'ʌp',
    'other': 'ʌðɚ', 'about': 'əbaʊt', 'out': 'aʊt', 'many': 'mɛni',
    'then': 'ðɛn', 'them': 'ðɛm', 'these': 'ðiːz', 'so': 'soʊ',
    'some': 'sʌm', 'her': 'hɜː', 'would': 'wʊd', 'make': 'meɪk',
    'like': 'laɪk', 'him': 'hɪm', 'into': 'ɪntuː', 'time': 'taɪm',
    'has': 'hæz', 'look': 'lʊk', 'two': 'tuː', 'more': 'mɔːɹ',
    'go': 'ɡoʊ', 'see': 'siː', 'no': 'noʊ', 'way': 'weɪ',
    'could': 'kʊd', 'my': 'maɪ', 'than': 'ðæn', 'first': 'fɜːst',
    'been': 'bɪn', 'who': 'huː', 'its': 'ɪts', 'now': 'naʊ',
    'people': 'piːpəl', 'over': 'oʊvɚ', 'did': 'dɪd',
    'down': 'daʊn', 'only': 'oʊnli', 'little': 'lɪɾəl',
    'very': 'vɛɹi', 'after': 'æftɚ', 'where': 'wɛɹ', 'most': 'moʊst',
    'through': 'θɹuː', 'before': 'bɪfɔːɹ', 'our': 'aʊɚ',
    'good': 'ɡʊd', 'me': 'miː', 'give': 'ɡɪv', 'does': 'dʌz',
    'here': 'hɪɹ', 'hello': 'həloʊ', 'world': 'wɜːld',
    'again': 'əɡɛn', 'any': 'ɛni', 'because': 'bɪkʌz',
    'say': 'seɪ', 'says': 'sɛz', 'once': 'wʌns', 'water': 'wɔːɾɚ',
    'were': 'wɜː', 'work': 'wɜːk', 'know': 'noʊ', 'should': 'ʃʊd',
    'something': 'sʌmθɪŋ', 'eye': 'aɪ', 'eyes': 'aɪz',
    'great': 'ɡɹeɪt', 'own': 'oʊn', 'thought': 'θɔːt',
    'laugh': 'læf', 'enough': 'ɪnʌf', 'though': 'ðoʊ',
    'speech': 'spiːtʃ', 'mister': 'mɪstɚ', 'doctor': 'dɑːktɚ',
}

# Longest-match context-free digraph/letter rules (en-us flavored).
# Order matters within each leading letter group.
_RULES = [
    ('tion', 'ʃən'), ('sion', 'ʒən'), ('ought', 'ɔːt'),
    ('eigh', 'eɪ'), ('ough', 'ʌf'), ('augh', 'ɔː'), ('tch', 'tʃ'),
    ('sch', 'sk'), ('dge', 'dʒ'), ('igh', 'aɪ'),
    ('ing', 'ɪŋ'), ('qu', 'kw'), ('ch', 'tʃ'), ('sh', 'ʃ'),
    ('th', 'θ'), ('ph', 'f'), ('wh', 'w'), ('ck', 'k'), ('ng', 'ŋ'),
    ('wr', 'ɹ'), ('kn', 'n'), ('gn', 'n'), ('mb', 'm'),
    ('ee', 'iː'), ('ea', 'iː'), ('oo', 'uː'), ('ou', 'aʊ'),
    ('ow', 'oʊ'), ('oi', 'ɔɪ'), ('oy', 'ɔɪ'), ('ay', 'eɪ'),
    ('ai', 'eɪ'), ('au', 'ɔː'), ('aw', 'ɔː'), ('ew', 'juː'),
    ('oa', 'oʊ'), ('ie', 'iː'), ('ei', 'eɪ'), ('ey', 'eɪ'),
    ('ar', 'ɑːɹ'), ('er', 'ɚ'), ('ir', 'ɜː'), ('or', 'ɔːɹ'),
    ('ur', 'ɜː'),
    ('a', 'æ'), ('b', 'b'), ('c', 'k'), ('d', 'd'), ('e', 'ɛ'),
    ('f', 'f'), ('g', 'ɡ'), ('h', 'h'), ('i', 'ɪ'), ('j', 'dʒ'),
    ('k', 'k'), ('l', 'l'), ('m', 'm'), ('n', 'n'), ('o', 'ɑː'),
    ('p', 'p'), ('r', 'ɹ'), ('s', 's'), ('t', 't'), ('u', 'ʌ'),
    ('v', 'v'), ('w', 'w'), ('x', 'ks'), ('y', 'j'), ('z', 'z'),
]

_PUNCT_KEEP = set('!\'(),.:;? -')


def _word_to_phonemes(word: str) -> str:
    lower = word.lower()
    if lower in _LEXICON:
        return _LEXICON[lower]
    # silent final e + magic-e vowel lengthening (made -> meɪd)
    out = []
    w = lower
    magic_e = (len(w) >= 3 and w.endswith('e') and w[-2] not in 'aeiou'
               and w[-3] in 'aeiou')
    if magic_e:
        w = w[:-1]
    magic_map = {'a': 'eɪ', 'i': 'aɪ', 'o': 'oʊ', 'u': 'juː', 'e': 'iː'}
    i = 0
    while i < len(w):
        # soft c / soft g before e,i,y
        if w[i] == 'c' and i + 1 < len(w) and w[i + 1] in 'eiy':
            out.append('s')
            i += 1
            continue
        if w[i] == 'g' and i + 1 < len(w) and w[i + 1] in 'eiy' \
                and w[i:i + 2] != 'ge':
            out.append('dʒ')
            i += 1
            continue
        if w[i] == 'y' and (i == len(w) - 1 or w[i + 1] not in 'aeiou'):
            out.append('i' if i == len(w) - 1 else 'ɪ')
            i += 1
            continue
        for pattern, ipa in _RULES:
            if w.startswith(pattern, i):
                if magic_e and len(pattern) == 1 and pattern in magic_map \
                        and i == len(w) - 2:
                    out.append(magic_map[pattern])
                else:
                    out.append(ipa)
                i += len(pattern)
                break
        else:
            i += 1  # unknown character: drop
    return ''.join(out)


def rule_based_g2p(text: str) -> str:
    pieces = re.split(r"([a-zA-Z']+)", text)
    out = []
    for piece in pieces:
        if not piece:
            continue
        if re.fullmatch(r"[a-zA-Z']+", piece):
            out.append(_word_to_phonemes(piece.replace("'", '')))
        else:
            out.append(''.join(ch for ch in piece
                               if ch in _PUNCT_KEEP or ch == ' '))
    return ''.join(out)

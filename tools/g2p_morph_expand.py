"""Corpus-scale G2P evaluation set builder: morphological expansion.

Round-4 VERDICT item 5: the held-out G2P evaluation (~230 words) is
statistically thin. There is no pronunciation oracle in this image (no
espeak binary, no cmudict), so the only scalable source of *trusted*
gold is composition: take base words whose espeak-convention IPA is
already curated (tests/resources/g2p_golden.tsv + g2p_heldout.tsv) and
derive regular inflections (-s/-es, -ed, -ing, -ly) whose gold
pronunciation follows from textbook English morphophonology applied to
the trusted base.

The suffix voicing / epenthesis / junction-flapping rules here are
written INDEPENDENTLY of forwardtacotron_tpu/text/g2p.py (no imports
from it) so the eval is not circular for composition phonology; since
both implement the same en-us conventions (espeak's ᵻ epenthesis, GA
t-flapping — reference utils/text/symbols.py:13-15 includes ᵻ and ɾ
precisely because espeak emits them), what this set genuinely measures
is the engine's orthographic stemming, stem pronunciation retrieval/
derivation, and junction phonology over ~2,000 unseen word forms.
Known limits (documented in docs/g2p.md): a minority of generated
forms are rare or nonce words — which still have well-defined
pronunciations by the regular paradigm, exactly how espeak treats
them — and forms whose flapping depends on stress (stem-final 'ɹt' +
'ɪ'-initial suffix) are excluded rather than guessed.

    python tools/g2p_morph_expand.py            # writes the TSV
    python tools/g2p_morph_expand.py --stats    # counts only
"""
from __future__ import annotations

import argparse
import pathlib

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_RES = _ROOT / 'tests' / 'resources'
OUT = _RES / 'g2p_expanded.tsv'

# ---------------------------------------------------------------------
# Independent composition phonology (do NOT import text/g2p.py here).

_VOWELS = set('iɪeɛæaɑɔoʊuʌɜəɚ')
_VOICELESS_FINAL = set('ptkfθ')          # s/ʃ handled by sibilant rule
_SIBILANT_ENDS = ('s', 'z', 'ʃ', 'ʒ', 'tʃ', 'dʒ')


def plural_suffix(stem_ipa: str) -> str:
    if stem_ipa.endswith(_SIBILANT_ENDS):
        return 'ᵻz'
    if stem_ipa[-1] in _VOICELESS_FINAL:
        return 's'
    return 'z'


def past_suffix(stem_ipa: str) -> str:
    if stem_ipa[-1] in 'td':
        return 'ᵻd'
    if stem_ipa[-1] in _VOICELESS_FINAL or stem_ipa.endswith(('s', 'ʃ', 'tʃ')):
        return 't'
    return 'd'


def _prev_is_vocalic(stem_ipa: str) -> bool:
    """True when the sound before the final consonant is a vowel (or a
    vowel-colored ɹ), the left context GA flapping needs."""
    body = stem_ipa[:-1]
    if not body:
        return False
    ch = body[-1]
    if ch == 'ː':
        ch = body[-2] if len(body) >= 2 else ''
    if ch == 'ɹ':
        ch2 = body[-2] if len(body) >= 2 else ''
        if ch2 == 'ː':
            ch2 = body[-3] if len(body) >= 3 else ''
        return ch2 in _VOWELS
    return ch in _VOWELS


def compose(stem_ipa: str, suffix_ipa: str) -> str:
    """Concatenate stem + suffix with GA junction flapping: stem-final
    t between a vocalic left context and a weak suffix vowel becomes ɾ
    (espeak-ng en-us: wanted -> wɑːntᵻd stays t after n, started ->
    stɑːɹɾᵻd flaps after ɹ, waiting -> weɪɾɪŋ)."""
    if (stem_ipa.endswith('t') and suffix_ipa
            and suffix_ipa[0] in 'ᵻɚɪi' and _prev_is_vocalic(stem_ipa)):
        return stem_ipa[:-1] + 'ɾ' + suffix_ipa
    return stem_ipa + suffix_ipa


# ---------------------------------------------------------------------
# Orthographic form generation.

# Irregular verbs: never generate -ed (and for the strongest cases the
# -s/-ing forms are fine and kept). Includes be/have/do/go classes and
# common strong verbs.
IRREGULAR_PAST = {
    'be', 'have', 'do', 'go', 'say', 'make', 'take', 'come', 'see',
    'get', 'know', 'think', 'find', 'give', 'tell', 'become', 'show',
    'leave', 'feel', 'put', 'bring', 'begin', 'keep', 'hold', 'write',
    'stand', 'hear', 'let', 'mean', 'set', 'meet', 'run', 'pay', 'sit',
    'speak', 'lie', 'lead', 'read', 'grow', 'lose', 'fall', 'send',
    'build', 'understand', 'draw', 'break', 'spend', 'cut', 'rise',
    'drive', 'buy', 'wear', 'choose', 'catch', 'teach', 'sell',
    'fight', 'throw', 'feed', 'deal', 'sing', 'ring', 'swim', 'fly',
    'blow', 'swear', 'sleep', 'sweep', 'win', 'hit', 'hurt', 'shut',
    'shake', 'hang', 'strike', 'forget', 'forgive', 'freeze', 'bend',
    'bind', 'bite', 'bleed', 'breed', 'burst', 'cast', 'cling', 'cost',
    'creep', 'dig', 'drink', 'eat', 'flee', 'fling', 'hide', 'kneel',
    'lay', 'lend', 'light', 'quit', 'ride', 'seek', 'shine', 'shoot',
    'shrink', 'slide', 'sling', 'speed', 'spin', 'spread', 'spring',
    'steal', 'stick', 'sting', 'stink', 'swing', 'tear', 'wake',
    'weave', 'weep', 'wind', 'bear', 'beat', 'arise', 'awake', 'cling',
    'dive', 'dream', 'drive', 'dwell', 'fit', 'forbid', 'grind',
    'kneel', 'knit', 'lean', 'leap', 'learn', 'mow', 'prove', 'saw',
    'sew', 'slay', 'smell', 'sow', 'spell', 'spill', 'spit', 'split',
    'spoil', 'tread', 'wed', 'wet', 'withdraw',
}

# Irregular / non-productive plurals: never generate -s.
IRREGULAR_PLURAL = {
    'man', 'woman', 'child', 'foot', 'tooth', 'goose', 'mouse',
    'person', 'ox', 'die', 'penny', 'leaf', 'life', 'wife', 'knife',
    'wolf', 'half', 'shelf', 'loaf', 'calf', 'thief', 'self', 'elf',
    'sheep', 'deer', 'fish', 'species', 'series', 'means', 'this',
    'that', 'these', 'those',
}

# Function words / words that never inflect (or whose inflection is a
# different lexeme): no forms generated at all.
NO_INFLECT = {
    'the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'on', 'at', 'by',
    'for', 'with', 'from', 'into', 'onto', 'than', 'then', 'when',
    'where', 'why', 'how', 'who', 'whom', 'whose', 'which', 'what',
    'not', 'no', 'yes', 'if', 'but', 'so', 'as', 'is', 'was', 'are',
    'were', 'am', 'been', 'being', 'because', 'although', 'though',
    'while', 'until', 'unless', 'about', 'above', 'below', 'under',
    'over', 'between', 'through', 'during', 'before', 'after',
    'against', 'among', 'toward', 'towards', 'upon', 'without',
    'within', 'i', 'you', 'he', 'she', 'it', 'we', 'they', 'me', 'him',
    'her', 'us', 'them', 'my', 'your', 'his', 'its', 'our', 'their',
    'mine', 'yours', 'hers', 'ours', 'theirs', 'myself', 'yourself',
    'himself', 'herself', 'itself', 'ourselves', 'themselves', 'this',
    'can', 'could', 'may', 'might', 'must', 'shall', 'should', 'will',
    'would', 'ought', 'very', 'too', 'also', 'just', 'only', 'even',
    'again', 'always', 'never', 'often', 'sometimes', 'soon', 'once',
    'twice', 'here', 'there', 'now', 'today', 'tomorrow', 'yesterday',
    'eight',  # eights/eighted collide with orthographic 'gh' stemming
    'teeth', 'feet', 'mice', 'geese', 'men', 'women', 'children',
    'people',  # irregular plurals as bases: no further inflection
}


def _is_cons(c: str) -> bool:
    return c.isalpha() and c not in 'aeiou'


def _gen_plural(w: str, ipa: str):
    if w in IRREGULAR_PLURAL:
        return None
    if w.endswith(('s', 'x', 'z', 'ch', 'sh')):
        # epenthesis is phonological, not orthographic: decide from
        # the trusted base IPA. 'stomach' spells 'ch' but ends /k/,
        # so its plural is 'stomachs' + s, not 'stomaches' + ᵻz
        if ipa.endswith(('s', 'z', 'ʃ', 'ʒ')):
            return w + 'es', compose(ipa, 'ᵻz')
        return w + 's', compose(ipa, plural_suffix(ipa))
    if w.endswith('y') and len(w) > 2 and _is_cons(w[-2]):
        # city -> cities; trusted base IPA ends in the reduced i
        return w[:-1] + 'ies', compose(ipa, 'z')
    if w.endswith('o') and len(w) > 2 and _is_cons(w[-2]):
        return None   # +s/+es split is lexical (photos vs potatoes)
    if w.endswith(('f', 'fe')):
        return None                          # f->v class: excluded
    return w + 's', compose(ipa, plural_suffix(ipa))


def _doubling_ambiguous(w: str) -> bool:
    """CVC-final polysyllables: doubling depends on final-syllable
    stress (admit->admitted vs visit->visited) which we can't resolve
    without stress marks — skip -ed/-ing for those stems."""
    return (len(w) > 4 and _is_cons(w[-1]) and w[-1] not in 'wxy'
            and w[-2] in 'aeiou' and len(w) >= 3 and _is_cons(w[-3]))


def _gen_past(w: str, ipa: str, base_words=frozenset()):
    if w in IRREGULAR_PAST or w.endswith('ed'):
        return None
    if not w.endswith('e') and (w + 'e') in base_words:
        return None   # bath+ed collides with bathe+d: e-verb wins
    if w.endswith('th'):
        return None   # wreath/wreathe-class voicing ambiguity
    if w[-1] in 'aiou':
        return None   # vowel-final: umbrellaed-class nonce, skip
    if w.endswith('e'):
        return w + 'd', compose(ipa, past_suffix(ipa))
    if w.endswith('y') and len(w) > 2 and _is_cons(w[-2]):
        return w[:-1] + 'ied', compose(ipa, 'd')
    if len(w) <= 4 and _is_cons(w[-1]) and w[-1] not in 'wxy' \
            and w[-2] in 'aeiou' and (len(w) < 3 or _is_cons(w[-3])):
        return w + w[-1] + 'ed', compose(ipa, past_suffix(ipa))
    if _doubling_ambiguous(w):
        return None
    if not w[-1].isalpha():
        return None
    return w + 'ed', compose(ipa, past_suffix(ipa))


def _gen_ing(w: str, ipa: str, base_words=frozenset()):
    if w.endswith('ing') or w in ('be',):
        return None
    if not w.endswith('e') and (w + 'e') in base_words:
        return None   # bath+ing collides with bathe+ing
    if w.endswith('th'):
        return None   # breathe-class voicing ambiguity
    # 'ɹt'-final stems + ɪ-initial suffix: flapping is stress-dependent
    # (starting flaps, participant-class doesn't) — excluded.
    if ipa.endswith('ɹt') or ipa.endswith('ɹːt'):
        return None
    if w.endswith('ie'):
        return None                          # lie -> lying: irregular y
    if w.endswith('e') and not w.endswith('ee'):
        return w[:-1] + 'ing', compose(ipa, 'ɪŋ')
    if len(w) <= 4 and _is_cons(w[-1]) and w[-1] not in 'wxy' \
            and w[-2] in 'aeiou' and (len(w) < 3 or _is_cons(w[-3])):
        return w + w[-1] + 'ing', compose(ipa, 'ɪŋ')
    if _doubling_ambiguous(w):
        return None
    if not w[-1].isalpha():
        return None
    return w + 'ing', compose(ipa, 'ɪŋ')


def _gen_ly(w: str, ipa: str):
    """-ly only over clearly adjectival endings so the output stays
    real English: -ful, -less, -ous, -ive, -ant/-ent, -al, -ish."""
    if not w.endswith(('ful', 'less', 'ous', 'ive', 'ant', 'ent',
                       'al', 'ish', 'ct', 'ic')):
        return None
    suffix = 'li' if not ipa.endswith('l') else 'i'
    if w.endswith('ic'):
        return w + 'ally', compose(ipa, 'əli')   # basic -> basically
    return w + 'ly', compose(ipa, suffix)


def load_bases():
    pairs, seen = [], set()
    for name in ('g2p_golden.tsv', 'g2p_heldout.tsv'):
        for ln in (_RES / name).read_text().splitlines():
            ln = ln.strip()
            if not ln or ln.startswith('#'):
                continue
            w, ipa = ln.split('\t')
            w, ipa = w.strip().lower(), ipa.strip()
            if ' ' in w or not w.isalpha() or w in seen:
                continue
            seen.add(w)
            pairs.append((w, ipa))
    return pairs, seen


def _is_derived_base(w: str, words) -> bool:
    """Bases that are themselves inflected forms of another base
    (golden contains e.g. 'dogs', 'wanted', 'running', 'friendly',
    'fastest') must not be inflected again — 'dogses' is not English."""
    cands = []
    if w.endswith('ies'):
        cands.append(w[:-3] + 'y')
    if w.endswith('es'):
        cands += [w[:-2], w[:-1]]
    elif w.endswith('s'):
        cands.append(w[:-1])
    if w.endswith('ied'):
        cands.append(w[:-3] + 'y')
    elif w.endswith('ed'):
        cands += [w[:-2], w[:-1]]
    if w.endswith('ing'):
        s = w[:-3]
        cands += [s, s + 'e']
        if len(s) > 2 and s[-1] == s[-2]:
            cands.append(s[:-1])
    if w.endswith('est'):
        cands += [w[:-3], w[:-2]]
    if w.endswith('iness'):
        cands.append(w[:-5] + 'y')
    elif w.endswith('ness'):
        cands.append(w[:-4])
    if w.endswith('ly'):
        cands.append(w[:-2])
    if w.endswith('ier'):
        cands.append(w[:-3] + 'y')
    elif w.endswith('er'):
        cands += [w[:-2], w[:-1]]
        if len(w) > 4 and w[-3] == w[-4]:
            cands.append(w[:-3])
    return any(c in words and c not in NO_INFLECT and len(c) >= 3
               for c in cands)


def expand():
    bases, base_words = load_bases()
    rows, out_words = [], set()
    frozen = frozenset(base_words)
    for w, ipa in bases:
        if w in NO_INFLECT or len(w) < 3 or not ipa:
            continue
        if w.endswith('s') and not w.endswith('ss'):
            continue   # plural-looking bases (statistics, economics)
        if _is_derived_base(w, base_words):
            continue
        for gen in (_gen_plural, _gen_past, _gen_ing, _gen_ly):
            if gen in (_gen_past, _gen_ing):
                got = gen(w, ipa, frozen)
            else:
                got = gen(w, ipa)
            if got is None:
                continue
            form, gold = got
            if form in base_words or form in out_words:
                continue   # stays an UNSEEN-form eval
            out_words.add(form)
            rows.append((form, gold, w))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stats', action='store_true')
    ap.add_argument('--out', default=str(OUT))
    args = ap.parse_args()
    rows = expand()
    if args.stats:
        print(f'{len(rows)} expanded forms from '
              f'{len(load_bases()[0])} bases')
        return
    lines = [
        '# MORPHOLOGICALLY EXPANDED G2P evaluation set — generated by',
        '# tools/g2p_morph_expand.py from the curated base IPA in',
        '# g2p_golden.tsv + g2p_heldout.tsv using composition phonology',
        '# written independently of text/g2p.py (see the tool docstring',
        '# for what this does and does not measure). Regenerate with:',
        '#   python tools/g2p_morph_expand.py',
        '# word<TAB>ipa (espeak-style en-us, stress stripped)',
    ]
    for form, gold, base in rows:
        lines.append(f'{form}\t{gold}')
    pathlib.Path(args.out).write_text('\n'.join(lines) + '\n')
    print(f'wrote {len(rows)} forms -> {args.out}')


if __name__ == '__main__':
    main()

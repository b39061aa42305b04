"""Sentence segmentation for long-input synthesis."""
from forwardtacotron_tpu.text.segmenter import split_sentences


def test_basic_split():
    out = split_sentences('Hello there. How are you? Fine! Good.')
    assert out == ['Hello there.', 'How are you?', 'Fine!', 'Good.']


def test_abbreviations_not_split():
    out = split_sentences('Dr. Smith lives on St. Mark Ave. in town. '
                          'He is fine.')
    assert out == ['Dr. Smith lives on St. Mark Ave. in town.',
                   'He is fine.']


def test_initials_not_split():
    out = split_sentences('George W. Bush met J. Smith. They talked.')
    assert out == ['George W. Bush met J. Smith.', 'They talked.']


def test_latin_abbreviations():
    out = split_sentences('Use fruit, e.g. apples. Stores open at '
                          '9 a.m. Every day.')
    assert out == ['Use fruit, e.g. apples.',
                   'Stores open at 9 a.m. Every day.']


def test_decimals_and_lowercase_continuation():
    out = split_sentences('Pi is 3.14 roughly. the rest follows. Done.')
    # lowercase after the period -> not a sentence start
    assert out == ['Pi is 3.14 roughly. the rest follows.', 'Done.']


def test_quotes_and_brackets():
    out = split_sentences('He said "Stop!" Then he left. (Really.) Yes.')
    assert out == ['He said "Stop!"', 'Then he left.', '(Really.)',
                   'Yes.']


def test_empty_and_single():
    assert split_sentences('') == []
    assert split_sentences('   ') == []
    assert split_sentences('No terminal punctuation') \
        == ['No terminal punctuation']


def test_max_len_clause_split():
    long = ('This clause goes on, and this one follows, '
            'and a third one closes the sentence.')
    out = split_sentences(long, max_len=45)
    assert len(out) >= 2
    assert all(len(p) <= 50 for p in out)
    assert ' '.join(out).replace('  ', ' ').split() == long.split()


def test_hard_split_without_clauses():
    word = 'a' * 30
    out = split_sentences(f'{word} {word} {word}', max_len=35)
    assert len(out) == 3

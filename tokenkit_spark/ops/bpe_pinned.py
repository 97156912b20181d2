"""PINNED BPE merge table: ops/bpe.py:train_bpe output at sf0.01
(n_merges=24). Regenerate with tools/pin_bpe_model.py.
"""

MERGES = [
    (' ', 's'),
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    (' ', 'c'),
    ('a', 's'),
    (' ', 'b'),
    (' ', 'v'),
    ('a', 'r'),
    ('p', 'ar'),
    (' ', 'f'),
    (' ', 'a'),
    (' ', 't'),
    ('j', 'o'),
    ('jo', 'in'),
    ('as', 'h'),
    ('h', 'ash'),
    (' ', 'join'),
    ('s', 't'),
    ('r', 'ow'),
]

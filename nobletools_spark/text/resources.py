"""Word lists mirroring the reference's bundled resources.

Sources (reference repo, read for behavior only):
- StopWords.lst        (47 lines, comments excluded -> 34 distinct words)
- PluralTable.lst      (plural-suffix -> singular-suffix map; insertion order kept)
- PrepositionWords.lst (67 words)
- CommonWords.lst      (100 most common English words, normalized at probe time)

The plural table is keyed by the *plural* suffix column, exactly as the
reference's ``loadResourceAsMap`` stores ``map[field1] = field0`` — later
duplicate plural keys overwrite the singular value but keep first-insert
order, which matters for ``singularize`` (first matching suffix wins).
"""

from __future__ import annotations

STOP_WORDS = frozenset(
    """a about an are as at be by for from how in is it la like of on or that
    the this to was what when where who will with und which there and around
    within along per had has too but""".split()
)

# plural_suffix -> singular_suffix, insertion-ordered (dict preserves order).
PLURAL_TABLE: dict[str, str] = {}
for _sing, _plur in [
    ("a", "ae"), ("a", "as"), ("an", "en"), ("ch", "ches"), ("eau", "eaus"),
    ("en", "ens"), ("ex", "ices"), ("ex", "exes"), ("f", "ves"), ("fe", "ves"),
    ("ieu", "ieus"), ("ieu", "ieux"), ("is", "es"), ("is", "ises"),
    ("ix", "ixes"), ("ix", "ices"), ("nx", "nxes"), ("k", "ks"), ("o", "oes"),
    ("o", "os"), ("on", "a"), ("on", "ons"), ("oo", "ee"), ("oof", "oofs"),
    ("oof", "ooves"), ("s", "ses"), ("sh", "shes"), ("um", "a"), ("um", "ums"),
    ("us", "era"), ("us", "i"), ("us", "uses"), ("us", "ora"), ("x", "xes"),
    ("y", "ies"), ("s", "s"), ("e", "es"), ("n", "ns"),
]:
    if _plur in PLURAL_TABLE:
        PLURAL_TABLE[_plur] = _sing  # overwrite value, keep original position
    else:
        PLURAL_TABLE[_plur] = _sing

PLURAL_SUFFIXES: tuple[str, ...] = tuple(PLURAL_TABLE.keys())

PREPOSITION_WORDS = frozenset(
    """aboard about above abreast across after against along alongside amid
    amidst among amongst around as aside at atop before behind below beneath
    beside besides between beyond by circa down during except for from in
    including inside into near next of off on onto opposite out outside over
    per since than through throughout till times to toward towards under
    underneath until up upon via with within without""".split()
)

COMMON_WORDS_RAW = frozenset(
    """the be of and a in to have it for I that you he on with do at by not
    this but from they his she or which as we an say will would can if their
    go what there all get her make who out up see know time take them some
    could so him year into its then think my come than more about now last
    your me no other give just should these also well any only new very when
    may way look like use such how because good find even most our over us de
    un""".split()
)

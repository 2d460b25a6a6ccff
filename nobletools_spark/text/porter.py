"""Classic Porter stemmer (Porter 1980, tartarus release 4 semantics).

Re-implemented from the published algorithm so that stems are identical to the
reference engine's stemmer (``tools/Stemmer.java``, which is the canonical
tartarus.org Java release): words of length <= 2 are returned unchanged, the
two published bug fixes (aed/eed/oed in step 3; bare 'ion' in step 5) are
honored, and the 'y' consonant rule alternates from position 0.

The stemmer defines the *keys* of the word/term dictionaries, so byte-exact
parity matters more than speed; ``stem_cached`` memoizes because corpus word
distributions are Zipfian (hit rates >99% on real text).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


class _P:
    """Mutable stemming state over a char buffer b[0..k]."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant-vowel sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if self.b[o : o + l] != list(s):
            return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for idx, ch in enumerate(s):
            if o + idx < len(self.b):
                self.b[o + idx] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- steps (numbered as in the reference Java, which folds the published
    #    step1a/1b into step1 and shifts the rest up by one) --

    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return
        for suff, repl in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suff):
                self.r(repl)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        for suff, repl in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suff):
                self.r(repl)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def step5(self) -> None:
        if self.k == 0:
            return
        prev = self.b[self.k - 1]
        if prev == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self.ends("ou"):
                pass
            else:
                return
        else:
            for suff in self._STEP5.get(prev, ()):
                if self.ends(suff):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def porter_stem(word: str) -> str:
    """Stem one lowercase word; words of length <= 2 are unchanged."""
    if len(word) <= 2:
        return word
    p = _P(word)
    p.step1()
    p.step2()
    p.step3()
    p.step4()
    p.step5()
    p.step6()
    return "".join(p.b[: p.k + 1])


@lru_cache(maxsize=262144)
def stem_cached(word: str) -> str:
    return porter_stem(word)


def stem(word: str) -> str:
    """Match the reference ``TextTools.stem``: lowercase then Porter-stem."""
    if not word:
        return ""
    return stem_cached(word.lower())

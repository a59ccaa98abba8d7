"""Golden signature vectors (FIXTURES.md F3) — pinned literals, the analog of
the reference's golden pixel tests (/root/reference/utils/resize_test.go:37-237).
Any change to tokenization, shingle mixing, token hashing, or the minhash
permutation scheme breaks these ON PURPOSE: regenerate only with a conscious
signature-format version bump (stored signatures in checkpoints would be
invalidated)."""

from __future__ import annotations

import numpy as np

from dedupe_ray.functions.minhash import MinHasher
from dedupe_ray.functions.simhash import simhash64

GOLDEN_SIMHASH = {
    "": 16294208416658607535,
    "a": 14958307749384151613,
    "the quick brown fox jumps over the lazy dog": 10994537620210763498,
    "spam spam spam spam": 16191361336467882237,
    "Hello, World! it's 42": 2182248589851407113,
    "der hund und die katze sind im haus": 12698615668183976200,
    "le chat est dans la maison avec les souris": 9207794908177624803,
    "one two three four five six seven eight nine ten": 3541537786082361868,
    "one two three four five six seven eight nine eleven": 2390870275078488590,
    "zzz qqq vvv mmm nnn ooo ppp": 4486839904525304510,
    "a b c d e f g h i j k l m n o p": 14340981600396419368,
    "café naïve r&d q&a über": 9707315580384027444,
    "x " * 50: 14823941509534457849,
    "lorem ipsum dolor sit amet consectetur adipiscing elit": 4332982709324954432,
    "data processing at one hundred terabytes needs partitioning": 2024808700759251108,
    "data processing at one hundred terabytes needs sharding": 11247899193982341249,
    "0 1 2 3 4 5 6 7 8 9": 1068180400502806576,
    "9 8 7 6 5 4 3 2 1 0": 12210996125666187922,
    "single": 17929242463620576174,
    "word word": 8760608178925721477,
}

GOLDEN_MINHASH_FIRST4 = {
    "": (310715688, 428438969, 1727140666, 713157935),
    "a": (1759222437, 2435036252, 1430663324, 1291263589),
    "the quick brown fox jumps over the lazy dog": (525278515, 256615839, 375676119, 104259900),
    "spam spam spam spam": (1965062285, 2026848787, 1336468884, 579734164),
    "Hello, World! it's 42": (512079008, 666559785, 686837285, 50979348),
    "der hund und die katze sind im haus": (16598077, 589843197, 559798107, 233730395),
    "le chat est dans la maison avec les souris": (1081880, 184800387, 7197375, 129581446),
    "one two three four five six seven eight nine ten": (92106732, 132433844, 991058407, 152083374),
    "one two three four five six seven eight nine eleven": (92106732, 132433844, 991058407, 175766276),
    "zzz qqq vvv mmm nnn ooo ppp": (1751033334, 134018543, 366064860, 643985964),
    "a b c d e f g h i j k l m n o p": (28229016, 526390489, 174879421, 139323731),
    "café naïve r&d q&a über": (706455701, 156890681, 1188437384, 515642547),
    "x " * 50: (929381911, 502009048, 4243022630, 657180295),
    "lorem ipsum dolor sit amet consectetur adipiscing elit": (659031473, 246608568, 98520244, 487188211),
    "data processing at one hundred terabytes needs partitioning": (52292463, 471141582, 1319415848, 93139637),
    "data processing at one hundred terabytes needs sharding": (288190423, 471141582, 1954886038, 93139637),
    "0 1 2 3 4 5 6 7 8 9": (309424468, 115392339, 46616253, 345134348),
    "9 8 7 6 5 4 3 2 1 0": (217985274, 32581749, 537121759, 83156410),
    "single": (3019032915, 513411726, 36692763, 4081589479),
    "word word": (3670550336, 1568593038, 3857316799, 3803580967),
}


def test_golden_simhash():
    for s, want in GOLDEN_SIMHASH.items():
        assert simhash64(s) == want, f"simhash drift for {s!r}"


def test_golden_minhash():
    mh = MinHasher(128, 3, 12345)
    for s, want in GOLDEN_MINHASH_FIRST4.items():
        got = tuple(int(v) for v in mh.text_signature(s)[:4])
        assert got == want, f"minhash drift for {s!r}"

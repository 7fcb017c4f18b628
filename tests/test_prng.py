import numpy as np

from dsp_tpu.core.prng import PM_RAND_MAX, TpdfNoise, pm_rand1, pm_rand2, tpdf_dither_get_mult


class TestPmRand:
    def test_minstd_16807_known_values(self):
        # Standard MINSTD0 sequence from seed 1
        g = pm_rand2(1)
        assert g.next() == 16807
        assert g.next() == 282475249
        assert g.next() == 1622650073

    def test_minstd_48271_known_values(self):
        g = pm_rand1(1)
        assert g.next() == 48271
        # s2 = 48271^2 mod (2^31-1)
        assert g.next() == (48271 * 48271) % PM_RAND_MAX

    def test_10000th_value_16807(self):
        # Park & Miller's classic check: 10000th value from seed 1 is 1043618065
        g = pm_rand2(1)
        vals = g.block(10000)
        assert vals[-1] == 1043618065

    def test_block_matches_next(self):
        g1, g2 = pm_rand1(123), pm_rand1(123)
        blk = g1.block(64)
        assert all(int(g2.next()) == int(v) for v in blk)

    def test_range(self):
        g = pm_rand1(999)
        blk = g.block(1000)
        assert (blk >= 1).all() and (blk <= PM_RAND_MAX).all()


class TestTpdf:
    def test_mult(self):
        assert tpdf_dither_get_mult(0) == 0.0
        assert tpdf_dither_get_mult(33) == 0.0
        assert tpdf_dither_get_mult(1) == 1.0 / PM_RAND_MAX
        assert tpdf_dither_get_mult(16) == 1.0 / (PM_RAND_MAX * float(1 << 15))

    def test_noise_stats(self):
        n = TpdfNoise()
        mult = tpdf_dither_get_mult(1)
        x = n.block(20000, mult)
        # TPDF at prec=1: difference of two uniforms on (0,1] -> triangular on (-1,1)
        assert abs(x.mean()) < 0.02
        assert np.abs(x).max() <= 1.0
        # variance = 2 * var(uniform) = 2/12 = 1/6
        assert abs(x.var() - 1.0 / 6.0) < 0.02

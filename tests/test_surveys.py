"""Survey-catalog surface: native FITS I/O, BOSS/HSC mappers, mangle
masks, velocity reconstruction, ephemeris, healpix ring/nest."""
import numpy as np
import pytest

from orphics_tpu.utils import fitsio
from orphics_tpu.utils import healpix as hp
from orphics_tpu.models import catalogs
from orphics_tpu import rect_geometry


class TestFitsIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "cat.fits")
        cols = {"RA": np.random.rand(100) * 360,
                "DEC": np.random.rand(100) * 40 - 20,
                "Z": np.random.rand(100),
                "ID": np.arange(100),
                "NAME": np.array([f"obj{i}" for i in range(100)])}
        fitsio.write_bintable(path, cols)
        back = fitsio.read_bintable(path)
        np.testing.assert_allclose(back["RA"], cols["RA"])
        np.testing.assert_allclose(back["DEC"], cols["DEC"])
        np.testing.assert_array_equal(back["ID"], cols["ID"])
        assert back["NAME"][3].decode() == "obj3"


def _boss_file(tmp_path, n=500, seed=0, name="boss.fits"):
    rng = np.random.default_rng(seed)
    path = str(tmp_path / name)
    fitsio.write_bintable(path, {
        "RA": rng.uniform(0, 30, n), "DEC": rng.uniform(-5, 5, n),
        "Z": rng.uniform(0.2, 0.8, n),
        "WEIGHT_SYSTOT": np.ones(n),
        "WEIGHT_NOZ": np.ones(n), "WEIGHT_CP": np.ones(n)})
    return path


class TestBoss:
    def test_load_boss_zcut(self, tmp_path):
        f = _boss_file(tmp_path)
        ras, decs, w, zs = catalogs.load_boss([f], 0.4, 0.6, True)
        assert np.all((zs >= 0.4) & (zs < 0.6))
        assert len(ras) == len(decs) == len(w) == len(zs)
        np.testing.assert_allclose(w, 1.0)  # unit weights in, unit out

    def test_boss_mapper_mask(self, tmp_path):
        f = _boss_file(tmp_path, 2000)
        fr = _boss_file(tmp_path, 20000, seed=1, name="rand.fits")
        geom = rect_geometry(width_arcmin=33 * 60, height_arcmin=11 * 60,
                             px_res_arcmin=30.0)
        bm = catalogs.BOSSMapper([f], random_files=[fr], zmin=0.2,
                                 zmax=0.8, geom=geom)
        assert bm.mask is not None
        # the randoms cover the catalog footprint: most galaxies land in
        # unmasked pixels
        assert bm.mask.mean() > 0.3
        assert float((np.asarray(bm.counts) * bm.mask).sum()) \
            > 0.8 * float(np.asarray(bm.counts).sum())


class TestHSC:
    def test_shear_maps(self):
        rng = np.random.default_rng(2)
        n = 5000
        table = {
            "ira": rng.uniform(0, 5, n), "idec": rng.uniform(-2, 2, n),
            "ishape_hsm_regauss_derived_weight": np.full(n, 10.0),
            "ishape_hsm_regauss_derived_rms_e": np.full(n, 0.4),
            "ishape_hsm_regauss_derived_bias_m": np.zeros(n),
            "ishape_hsm_regauss_e1": np.full(n, 0.21),
            "ishape_hsm_regauss_e2": np.full(n, -0.07),
            "ishape_hsm_regauss_derived_bias_c1": np.zeros(n),
            "ishape_hsm_regauss_derived_bias_c2": np.zeros(n)}
        geom = rect_geometry(width_arcmin=6 * 60, height_arcmin=5 * 60,
                             px_res_arcmin=30.0)
        hm = catalogs.HSCMapper(table=table, geom=geom, mask_threshold=4.0)
        g1, g2 = hm.get_shear(do_m=False, do_c=False)
        # constant e over many objects: g = e / (2 * (1 - rms^2))
        want1 = 0.21 / (2 * (1 - 0.4 ** 2))
        occ = np.asarray(hm.counts) > 3
        np.testing.assert_allclose(g1[occ], want1, rtol=1e-6)
        np.testing.assert_allclose(g2[occ], -0.07 / (2 * (1 - 0.16)),
                                   rtol=1e-6)


class TestMangle:
    def test_cap_rasterization(self, tmp_path):
        """A single polar cap of radius t: pixel fraction ~ (1-cos t)/2."""
        t = 0.5
        cm = 1 - np.cos(t)
        ply = f"""1 polygons
polygon 0 ( 1 caps, 0.75 weight, 0 pixel, 0 str):
 0.0 0.0 1.0 {cm}
"""
        f = str(tmp_path / "mask.ply")
        with open(f, "w") as fh:
            fh.write(ply)
        m = catalogs.hp_from_mangle([f], nside=32)
        frac = (m > 0).mean()
        want = (1 - np.cos(t)) / 2
        assert abs(frac / want - 1) < 0.05
        assert np.allclose(m[m > 0], 0.75)

    def test_veto(self, tmp_path):
        cm_all = 2.0   # full sphere
        ply_w = "1 polygons\npolygon 0 ( 1 caps, 1 weight, 0 pixel, 0 str):\n 0 0 1 2.0\n"
        ply_v = "1 polygons\npolygon 0 ( 1 caps, 1 weight, 0 pixel, 0 str):\n 0 0 1 0.1\n"
        fw = str(tmp_path / "w.ply")
        fv = str(tmp_path / "v.ply")
        open(fw, "w").write(ply_w)
        open(fv, "w").write(ply_v)
        m = catalogs.hp_from_mangle([fw], nside=16, veto_ply_files=[fv])
        # polar hole vetoed
        theta, _ = hp.pix2ang(16, np.arange(hp.nside2npix(16)))
        hole = 1 - np.cos(theta) < 0.1
        assert np.all(m[hole] == 0)
        assert np.all(m[~hole] == 1)


class TestVelocityRecon:
    def test_infall_sign(self):
        """Galaxies clumped at one point embedded in uniform randoms:
        reconstructed LOS velocities show infall (positive in front of
        the clump as seen from the observer, negative behind)."""
        rng = np.random.default_rng(3)
        nr = 40000
        ras_r = rng.uniform(-10, 10, nr)
        decs_r = rng.uniform(-10, 10, nr)
        zs_r = rng.uniform(0.4, 0.7, nr)
        # galaxies: uniform + a strong clump at (0, 0, z=0.55)
        ng_u, ng_c = 8000, 4000
        ras = np.concatenate([rng.uniform(-10, 10, ng_u),
                              rng.normal(0, 0.7, ng_c)])
        decs = np.concatenate([rng.uniform(-10, 10, ng_u),
                               rng.normal(0, 0.7, ng_c)])
        zs = np.concatenate([rng.uniform(0.4, 0.7, ng_u),
                             rng.normal(0.55, 0.012, ng_c)])
        zs = np.clip(zs, 0.4, 0.7)
        v = catalogs.reconstruct_velocities(
            ras, decs, zs, ras_r, decs_r, zs_r, zeff=0.55, nmesh=64,
            smoothing_radius=15.0)
        assert np.all(np.isfinite(v))
        near = slice(ng_u, ng_u + ng_c)
        vc = v[near]
        zc = zs[near]
        front = vc[(zc > 0.52) & (zc < 0.545)]
        behind = vc[(zc > 0.555) & (zc < 0.58)]
        assert front.mean() > 10.0      # km/s, falling away from us
        assert behind.mean() < -10.0    # falling toward us


class TestEphemeris:
    def test_sun_equinox_solstice(self):
        import datetime
        from orphics_tpu import ephem
        ct = datetime.datetime(2000, 3, 20, 7, 35,
                               tzinfo=datetime.timezone.utc).timestamp()
        radec, r = ephem.eval_body("Sun", ct)
        assert abs(np.degrees(radec[0, 1])) < 0.05
        assert abs(r[0] - 1.0) < 0.02
        ct = datetime.datetime(2010, 6, 21, 11, 28,
                               tzinfo=datetime.timezone.utc).timestamp()
        radec, _ = ephem.eval_body("Sun", ct)
        assert abs(np.degrees(radec[0, 0]) - 90.0) < 0.5
        assert abs(np.degrees(radec[0, 1]) - 23.44) < 0.05

    def test_inner_planet_elongations(self):
        from orphics_tpu import ephem
        ts = np.linspace(1.3e9, 1.42e9, 1200)
        sun, _ = ephem.eval_body("Sun", ts)

        def elong(b):
            p, _ = ephem.eval_body(b, ts)
            cosd = (np.sin(p[:, 1]) * np.sin(sun[:, 1])
                    + np.cos(p[:, 1]) * np.cos(sun[:, 1])
                    * np.cos(p[:, 0] - sun[:, 0]))
            return np.degrees(np.arccos(np.clip(cosd, -1, 1)))

        assert elong("Mercury").max() < 29.0
        assert 15.0 < elong("Mercury").max()
        assert elong("Venus").max() < 48.5
        assert 40.0 < elong("Venus").max()

    def test_annotations(self):
        from orphics_tpu import time_utils
        ann = time_utils.body_circle_annotations(1.4e9, 1.4e9 + 86400 * 30,
                                                 bodies=["Sun", "Moon"])
        kinds = {a[0] for a in ann}
        assert kinds == {"circle", "text"}
        decs = [a[1] for a in ann if a[0] == "circle"]
        assert all(-90 <= d <= 90 for d in decs)

    def test_get_columns(self):
        from orphics_tpu.time_utils import get_columns
        obs = [{"a": 1, "b": 2.0}, {"a": 3, "b": 4.0}]
        cols = get_columns(obs, ["a", "b"])
        np.testing.assert_array_equal(cols["a"], [1, 3])


class TestHealpixOrdering:
    @pytest.mark.parametrize("nside", [1, 2, 8, 32])
    def test_ring_nest_roundtrip(self, nside):
        p = np.arange(hp.nside2npix(nside))
        rn = hp.ring2nest(nside, p)
        assert sorted(rn.tolist()) == p.tolist()
        np.testing.assert_array_equal(hp.nest2ring(nside, rn), p)

    def test_ud_grade_means(self):
        nside = 32
        th, _ = hp.pix2ang(nside, np.arange(hp.nside2npix(nside)))
        zmap = np.cos(th)
        zd = hp.ud_grade(zmap, 8)
        th8, _ = hp.pix2ang(8, np.arange(hp.nside2npix(8)))
        assert np.abs(zd - np.cos(th8)).max() < 0.01
        # upgrade replicates exactly
        up = hp.ud_grade(zmap, 64)
        back = hp.ud_grade(up, 32)
        np.testing.assert_allclose(back, zmap)

    def test_ud_grade_power(self):
        m = np.ones(hp.nside2npix(16))
        d = hp.ud_grade(m, 8, power=-2)
        np.testing.assert_allclose(d, 4.0)  # sum-preserving counts


class TestHealpixHarmonic:
    """hp.smoothing/map2alm/alm2map surface via the ring bridge
    (mask/template-grade accuracy, like the reference's order-0 healpix
    mask work)."""

    def test_smoothing_constant_preserved(self):
        from orphics_tpu.utils import healpix as hp
        nside = 16
        const = np.full(hp.nside2npix(nside), 3.0)
        sm = hp.smoothing(const, np.deg2rad(5.0))
        np.testing.assert_allclose(sm, 3.0, atol=1e-3)

    def test_smoothing_dipole_beam_factor(self):
        from orphics_tpu.utils import healpix as hp
        nside = 32
        npix = hp.nside2npix(nside)
        tt, _pp = hp.pix2ang(nside, np.arange(npix))
        dip = np.cos(tt)
        fwhm = np.deg2rad(10.0)
        sm = hp.smoothing(dip, fwhm)
        sig = fwhm / np.sqrt(8 * np.log(2))
        b1 = np.exp(-0.5 * 1 * 2 * sig ** 2)
        sel = np.abs(dip) > 0.5
        ratio = np.median(sm[sel] / dip[sel])
        assert abs(ratio - b1) < 0.01

    def test_alm_roundtrip_smooth_field(self):
        from orphics_tpu.utils import healpix as hp
        nside = 32
        npix = hp.nside2npix(nside)
        tt, pp = hp.pix2ang(nside, np.arange(npix))
        field = np.cos(tt) + 0.3 * np.sin(tt) * np.cos(pp)
        alm = hp.map2alm(field, lmax=8)
        m2 = hp.alm2map(alm, nside)
        assert np.abs(m2 - field).max() < 0.1
        assert np.abs(np.median(m2 - field)) < 1e-3


def test_fits_logical_and_tzero_columns(tmp_path):
    """Review regressions: FITS 'L' columns are ASCII 'T'/'F' bytes
    (raw uint8 84/70 made False truthy), and TSCAL/TZERO-scaled
    columns (astropy's unsigned ints) must be de-scaled on read."""
    import struct
    from orphics_tpu.utils import fitsio as fio
    # hand-build a tiny bintable: one L column, one TZERO'd J column
    nrows = 3
    rowbytes = 1 + 4
    def card(k, v):
        if isinstance(v, str):
            return f"{k:<8}= '{v}'".ljust(80).encode()
        if isinstance(v, bool):
            return f"{k:<8}= {'T' if v else 'F':>20}".ljust(80).encode()
        return f"{k:<8}= {v:>20}".ljust(80).encode()
    def block(cards):
        raw = b"".join(cards) + b"END".ljust(80)
        return raw.ljust(-(-len(raw) // 2880) * 2880, b" ")
    primary = block([card("SIMPLE", True), card("BITPIX", 8),
                     card("NAXIS", 0)])
    table_hdr = block([
        card("XTENSION", "BINTABLE"), card("BITPIX", 8),
        card("NAXIS", 2), card("NAXIS1", rowbytes),
        card("NAXIS2", nrows), card("PCOUNT", 0), card("GCOUNT", 1),
        card("TFIELDS", 2),
        card("TTYPE1", "FLAG"), card("TFORM1", "L"),
        card("TTYPE2", "UID"), card("TFORM2", "J"),
        card("TZERO2", 2147483648)])
    rows = b""
    uids = [3000000000, 5, 2147483648]
    flags = [True, False, True]
    for fl, uid in zip(flags, uids):
        rows += (b"T" if fl else b"F") \
            + struct.pack(">i", uid - 2147483648)
    data = rows.ljust(-(-len(rows) // 2880) * 2880, b"\x00")
    p = tmp_path / "t.fits"
    p.write_bytes(primary + table_hdr + data)
    out = fio.read_bintable(str(p))
    assert out["FLAG"].dtype == bool
    assert list(out["FLAG"]) == flags
    assert list(out["UID"]) == uids


class TestPlanckLensingAlms:
    def test_load_mv_alms_roundtrip(self, tmp_path):
        """load_mv_alms reads a healpy-format alm bintable (index =
        l^2+l+m+1) into healpy triangular ordering with the reference's
        [lmin, lmax] band-limit (interfaces.py:286-291)."""
        from orphics_tpu.utils import fitsio
        from orphics_tpu.interfaces import PlanckLensing
        rng = np.random.default_rng(0)
        lmax_file = 32
        ls, ms = [], []
        for m in range(lmax_file + 1):
            for l in range(m, lmax_file + 1):
                ls.append(l); ms.append(m)
        ls = np.asarray(ls); ms = np.asarray(ms)
        idx = ls * ls + ls + ms + 1
        re_ = rng.standard_normal(len(ls))
        im_ = rng.standard_normal(len(ls))
        d = tmp_path / "MV"
        d.mkdir()
        fitsio.write_bintable(str(d / "dat_klm.fits"),
                              {"index": idx.astype(np.int64),
                               "real": re_, "imag": im_})
        pl = PlanckLensing(root=str(tmp_path))
        alm = pl.load_mv_alms(lmin=8, lmax=24)
        out_lmax = 24
        assert alm.shape == ((out_lmax + 1) * (out_lmax + 2) // 2,)
        # spot-check a few (l, m) against the healpy triangular index
        for (l, m) in [(8, 0), (12, 5), (24, 24), (20, 3)]:
            tri = m * (2 * out_lmax + 1 - m) // 2 + l
            src = np.where((ls == l) & (ms == m))[0][0]
            assert alm[tri] == re_[src] + 1j * im_[src]
        # band limit: l < 8 and l > 24 are zero
        for (l, m) in [(2, 0), (7, 7)]:
            tri = m * (2 * out_lmax + 1 - m) // 2 + l
            assert alm[tri] == 0

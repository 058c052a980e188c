"""Reference-in-the-loop parity for ``orphics.foregrounds``.

The live reference module imports ``orphics.maps`` (pixell) and — at
call time inside ``ilc_power`` — ``szar.foregrounds`` and (via
``cosmology.default_theory``) ``pyfisher``; all three run here on the
independent numpy shims in ``tests/_ref_shims``. Both sides read the
same on-disk template data (byte-identical copies, asserted below).

Intentional divergences pinned here and documented in MIGRATION.md:

- ``get_radio_power`` cross-frequency unit conversion: the reference
  multiplies by ``ItoDeltaT(freq_ghz)**2`` — the FIRST frequency twice
  (``foregrounds.py:307``) — while orphics_tpu converts each leg with
  its own frequency (``ItoDeltaT(f1) * ItoDeltaT(f2)``).
- ``get_radio_power`` with a single frequency raises TypeError in the
  reference (``None > float`` at ``foregrounds.py:259``); orphics_tpu
  returns the auto power.
- the reference ``model_vec``/``fg_fit``/``quick_fit`` stack cannot
  execute: ``fg_fit`` names Poisson amplitudes ``Aps_{nu}`` while its
  own ``fg_cl`` reads ``Aps_{i}_{j}`` (and ``A_dust``/``A_ksz`` are
  absent from ``all_params``), so ``model_vec`` raises KeyError on the
  parameter vector ``fg_fit`` itself constructs. orphics_tpu ships a
  working equivalent with the ``fg_cl`` key convention.
"""
import os
import sys
import warnings

import numpy as np
import pytest

REF_ROOT = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "_ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "orphics")),
    reason="upstream reference not mounted")

for p in (SHIM, REF_ROOT):
    if p not in sys.path:
        sys.path.insert(0, p)

rfg = pytest.importorskip("orphics.foregrounds")
rcosmo = pytest.importorskip("orphics.cosmology")

import orphics_tpu.models.foregrounds as tfg  # noqa: E402
from orphics_tpu.models.theory import default_theory as t_default_theory  # noqa: E402

ELLS = np.arange(2, 8000, 7).astype(float)
FREQS5 = np.array([39., 93., 145., 225., 280.])
FLUX5 = [10., 7., 10., 10., 10.]


def test_template_data_is_byte_identical():
    import orphics_tpu
    tdata = os.path.join(os.path.dirname(orphics_tpu.__file__), "data")
    rdata = os.path.join(REF_ROOT, "data")
    for rel in ("foregrounds/sz_template_battaglia.csv",
                "foregrounds/early_ksz.txt", "foregrounds/late_ksz.txt",
                "radio_counts/auto_fit_vals.dat",
                "radio_counts/Para_6degPol_XPS_Scut.dat"):
        with open(os.path.join(tdata, rel), "rb") as a, \
                open(os.path.join(rdata, rel), "rb") as b:
            assert a.read() == b.read(), rel


# ---------------------------------------------------------------------
# SED units and frequency factors (reference :54-77, :603)
# ---------------------------------------------------------------------

def test_sed_units_match_reference():
    nus = np.array([27., 39., 93., 145., 225., 280., 353.])
    np.testing.assert_allclose(tfg.dBnudT(nus), rfg.dBnudT(nus), rtol=1e-12)
    np.testing.assert_allclose(tfg.ItoDeltaT(nus), rfg.ItoDeltaT(nus),
                               rtol=1e-12)
    np.testing.assert_allclose(tfg.planck(nus * 1e9, 24.0),
                               rfg.planck(nus * 1e9, 24.0), rtol=1e-12)
    np.testing.assert_allclose(tfg.g_tsz(nus), rfg.g_tsz(nus), rtol=1e-12)
    np.testing.assert_allclose(tfg.ffunc(nus), rfg.ffunc(nus), rtol=1e-12)
    clyy = 1e-13 * (ELLS / 3000.0) ** -0.7
    np.testing.assert_allclose(tfg.cltsz(1.3, 93., 145., clyy),
                               rfg.cltsz(1.3, 93., 145., clyy), rtol=1e-12)


def test_dl_filler_matches_reference():
    ls = np.arange(10, 5000, 5).astype(float)
    cls = (ls / 3000.0) ** 1.3 - 0.2
    ells = np.array([1.0, 9.0, 500.0, 4999.0, 6000.0, 9000.0])
    for fill in ("extrapolate", "constant_dl", "zeros"):
        for pos in (False, True):
            r = rfg.dl_filler(ells, ls, cls, fill_type=fill,
                              fill_positive=pos, silence=True)
            t = tfg.dl_filler(ells, ls, cls, fill_type=fill,
                              fill_positive=pos, silence=True)
            np.testing.assert_allclose(t, r, rtol=1e-10, atol=1e-13,
                                       err_msg=f"{fill} pos={pos}")
    with pytest.raises(ValueError):
        rfg.dl_filler(ells, ls, cls, fill_type="nope", silence=True)
    with pytest.raises(ValueError):
        tfg.dl_filler(ells, ls, cls, fill_type="nope", silence=True)


def test_power_y_template_matches_reference():
    for fill in ("extrapolate", "zeros", "constant_dl"):
        r = rfg.power_y_template(ELLS, fill_type=fill, silence=True)
        t = tfg.power_y_template(ELLS, fill_type=fill, silence=True)
        np.testing.assert_allclose(t, r, rtol=1e-10, err_msg=fill)
    r = rfg.power_y_template(ELLS, A_tsz=2.0, silence=True)
    t = tfg.power_y_template(ELLS, A_tsz=2.0, silence=True)
    np.testing.assert_allclose(t, r, rtol=1e-10)


def test_power_ksz_templates_match_reference():
    np.testing.assert_allclose(
        tfg.power_ksz_reion(ELLS, A_rksz=1.5, silence=True),
        rfg.power_ksz_reion(ELLS, A_rksz=1.5, silence=True), rtol=1e-10)
    np.testing.assert_allclose(
        tfg.power_ksz_late(ELLS, A_lksz=0.7, silence=True),
        rfg.power_ksz_late(ELLS, A_lksz=0.7, silence=True), rtol=1e-10)


# ---------------------------------------------------------------------
# radio source counts (reference :198-331)
# ---------------------------------------------------------------------

def test_radio_source_counts_match_reference():
    fluxes = np.geomspace(0.05, 50.0, 40)
    for freq in (30.0, 93.0, 148.0, 225.0):
        r = rfg.get_radio_differential_source_counts(fluxes, freq)
        t = tfg.get_radio_differential_source_counts(fluxes, freq)
        np.testing.assert_allclose(t, r, rtol=1e-10, err_msg=str(freq))


def test_parse_kij_matches_reference():
    rk = rfg.parse_Kij_file()
    tk = tfg.parse_Kij_file()
    assert set(rk.keys()) == set(tk.keys())
    for key in rk:
        np.testing.assert_allclose(tk[key], rk[key], rtol=1e-12,
                                   err_msg=str(key))


def test_radio_power_auto_matches_reference():
    # the reference's own idiom (ilc_power fdict): both freq/flux args
    r = rfg.get_radio_power(7.0, 93.0, flux_limit_mJy_2=7.0,
                            freq_ghz_2=93.0, prefit=True)
    t = tfg.get_radio_power(7.0, 93.0, flux_limit_mJy_2=7.0,
                            freq_ghz_2=93.0, prefit=True)
    np.testing.assert_allclose(t, r, rtol=1e-7)
    r = rfg.get_radio_power(10.0, 145.0, flux_limit_mJy_2=10.0,
                            freq_ghz_2=145.0, units_Jy_sr=True)
    t = tfg.get_radio_power(10.0, 145.0, flux_limit_mJy_2=10.0,
                            freq_ghz_2=145.0, units_Jy_sr=True)
    np.testing.assert_allclose(t, r, rtol=1e-10)
    # above the zero cutoff both return exactly 0
    assert rfg.get_radio_power(7.0, 225.0, flux_limit_mJy_2=7.0,
                               freq_ghz_2=225.0) == 0.0
    assert tfg.get_radio_power(7.0, 225.0, flux_limit_mJy_2=7.0,
                               freq_ghz_2=225.0) == 0.0


def test_radio_power_cross_unit_divergence_pinned():
    """Cross power: reference converts (Jy/sr)^2 with ItoDeltaT(f1)^2
    (foregrounds.py:307); we convert each leg with its own frequency.
    In Jy-sr units (no conversion) the two agree exactly."""
    kw = dict(flux_limit_mJy_2=10.0, freq_ghz_2=145.0)
    r_jy = rfg.get_radio_power(7.0, 93.0, units_Jy_sr=True, **kw)
    t_jy = tfg.get_radio_power(7.0, 93.0, units_Jy_sr=True, **kw)
    np.testing.assert_allclose(t_jy, r_jy, rtol=1e-10)
    r_uk = rfg.get_radio_power(7.0, 93.0, **kw)
    t_uk = tfg.get_radio_power(7.0, 93.0, **kw)
    np.testing.assert_allclose(r_uk, r_jy * 1e-52 * rfg.ItoDeltaT(93.) ** 2,
                               rtol=1e-12)
    np.testing.assert_allclose(
        t_uk, t_jy * 1e-52 * rfg.ItoDeltaT(93.) * rfg.ItoDeltaT(145.),
        rtol=1e-7)
    # the divergence is exactly the ItoDeltaT ratio (~44% at 93x145)
    np.testing.assert_allclose(t_uk / r_uk,
                               rfg.ItoDeltaT(145.) / rfg.ItoDeltaT(93.),
                               rtol=1e-7)


def test_radio_power_single_freq_call_divergence_pinned():
    """Reference: auto call without freq_ghz_2 raises TypeError
    (None > float at foregrounds.py:259). orphics_tpu returns the auto
    power."""
    with pytest.raises(TypeError):
        rfg.get_radio_power(7.0, 93.0)
    t = tfg.get_radio_power(7.0, 93.0)
    r = rfg.get_radio_power(7.0, 93.0, flux_limit_mJy_2=7.0,
                            freq_ghz_2=93.0)
    np.testing.assert_allclose(t, r, rtol=1e-7)


def test_radio_power_nonprefit_unreachable_in_reference_pinned():
    """The reference's counts-integral path (prefit=False) is
    unreachable: reaching it requires both second-frequency args
    (line 259 TypeErrors otherwise), but supplying them raises
    NotImplementedError (line 266) BEFORE the same-frequency check
    that would flip ``cross`` back to False. orphics_tpu computes the
    Lagache-counts integral and it agrees with the prefit power-law
    fit to those same counts within the fit's accuracy."""
    with pytest.raises(NotImplementedError):
        rfg.get_radio_power(7.0, 93.0, flux_limit_mJy_2=7.0,
                            freq_ghz_2=93.0, prefit=False)
    t_int = tfg.get_radio_power(7.0, 93.0, prefit=False)
    t_fit = tfg.get_radio_power(7.0, 93.0, prefit=True)
    assert abs(t_int / t_fit - 1) < 0.15


# ---------------------------------------------------------------------
# dust model (reference :1204-1300)
# ---------------------------------------------------------------------

def test_dust_model_matches_reference():
    nus = np.array([93., 145., 225., 353.])
    np.testing.assert_allclose(tfg._planck_Bnu_ratio(nus, 353.0, 19.6),
                               rfg._planck_Bnu_ratio(nus, 353.0, 19.6),
                               rtol=1e-12)
    np.testing.assert_allclose(tfg._g_nu_ratio(nus, 353.0),
                               rfg._g_nu_ratio(nus, 353.0), rtol=1e-12)
    np.testing.assert_allclose(tfg.dust_mu(nus, beta_d=1.6),
                               rfg.dust_mu(nus, beta_d=1.6), rtol=1e-12)
    for xy in ("TT", "EE"):
        r = rfg.dust_C_ell_Louis25(ELLS, 93., 145., 8.0, XY=xy, beta_d=1.6)
        t = tfg.dust_C_ell_Louis25(ELLS, 93., 145., 8.0, XY=xy, beta_d=1.6)
        np.testing.assert_allclose(t, r, rtol=1e-12, err_msg=xy)


# ---------------------------------------------------------------------
# sky model pieces (reference :707-800)
# ---------------------------------------------------------------------

P_FGCL = {"Aps_0_0": 3.0, "Aps_0_1": 2.0, "Aps_1_1": 4.0,
          "Acib_150": 4.9, "alpha_cib": 3.5, "Atsz": 1.1,
          "A_dust": 9.0, "beta_dust": 1.6, "A_ksz": 1.0, "A_cmb": 1.0,
          # Aatm_corr = 0: the cross-pair atm term's unit convention
          # intentionally diverges (see the pinned get_noise test)
          "rN_93.0": 1.2, "rN_145.0": 0.9, "Aatm_corr": 0.0}


def test_fg_cl_matches_reference():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        clyy = rfg.power_y_template(ELLS, silence=True)
        for (i, j) in ((0, 0), (0, 1), (1, 1)):
            r = rfg.fg_cl(ELLS.copy(), P_FGCL, i, j, clyy, [93., 145.])
            t = tfg.fg_cl(ELLS.copy(), P_FGCL, i, j, clyy, [93., 145.])
            np.testing.assert_allclose(t, r, rtol=1e-9, err_msg=str((i, j)))


def test_get_noise_matches_reference():
    lknees = [3000.0, 0.0]
    alphas = [-3.5, -4.0]
    r = rfg.get_noise(ELLS, 0, 0, 8.0, 8.0, lknees, alphas)
    t = tfg.get_noise(ELLS, 0, 0, 8.0, 8.0, lknees, alphas)
    np.testing.assert_allclose(t, r, rtol=1e-6, err_msg="auto rednoise")
    r = rfg.get_noise(ELLS, 1, 1, 10.0, 10.0, lknees, alphas)
    t = tfg.get_noise(ELLS, 1, 1, 10.0, 10.0, lknees, alphas)
    np.testing.assert_allclose(np.full(ELLS.shape, float(np.asarray(r))),
                               t, rtol=1e-12, err_msg="auto white")
    np.testing.assert_allclose(tfg.wnoise_cl(8.0), rfg.wnoise_cl(8.0),
                               rtol=1e-12)


def test_get_noise_cross_units_divergence_pinned():
    """Cross-pair atmospheric bias: the reference scales by
    ``sig_geom * arcmin^2`` — the geometric-mean RMS UNsquared
    (foregrounds.py:753), which carries uK^1 units — while orphics_tpu
    uses the white-noise power ``(sig_geom * arcmin)^2``. The
    divergence is exactly the factor sig_geom."""
    lknees = [3000.0, 2000.0]
    alphas = [-3.5, -3.5]
    r = rfg.get_noise(ELLS, 0, 1, 8.0, 10.0, lknees, alphas, atm_corr=0.3)
    t = tfg.get_noise(ELLS, 0, 1, 8.0, 10.0, lknees, alphas, atm_corr=0.3)
    assert r[0] > 0 and t[0] > 0  # non-vacuous: both lknees nonzero
    np.testing.assert_allclose(t, r * np.sqrt(8.0 * 10.0), rtol=1e-10)


def test_sky_model_matches_reference():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = rfg.sky_model(ELLS.copy(), 0, 1, P_FGCL, [93., 145.])
        t = tfg.sky_model(ELLS.copy(), 0, 1, P_FGCL, [93., 145.])
    np.testing.assert_allclose(t, r, rtol=1e-4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r, r_fg = rfg.sky_model(ELLS.copy(), 0, 0, P_FGCL, [93., 145.],
                                return_fg=True)
        t, t_fg = tfg.sky_model(ELLS.copy(), 0, 0, P_FGCL, [93., 145.],
                                return_fg=True)
    np.testing.assert_allclose(t_fg, r_fg, rtol=1e-9)
    np.testing.assert_allclose(t, r, rtol=1e-4)


def test_evaluate_model_dict_matches_reference():
    import orphics.maps as rmaps
    from orphics_tpu.ops.fourier import gauss_beam
    freqs = np.array([93., 145.])
    ell = ELLS.copy()
    cl_cmb = 1e3 / (10.0 + ell) ** 2
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cl_yy = rfg.power_y_template(ell, silence=True)
        rbeams = [lambda x: rmaps.gauss_beam(x, 2.2),
                  lambda x: rmaps.gauss_beam(x, 1.4)]
        tbeams = [lambda x: np.asarray(gauss_beam(x, 2.2), dtype=float),
                  lambda x: np.asarray(gauss_beam(x, 1.4), dtype=float)]
        rd = rfg.evaluate_model_dict(ell, P_FGCL, freqs, [8., 10.], rbeams,
                                     [3000., 2000.], [-3.5, -3.5],
                                     cl_cmb, cl_yy)
        td = tfg.evaluate_model_dict(ell, P_FGCL, freqs, [8., 10.], tbeams,
                                     [3000., 2000.], [-3.5, -3.5],
                                     cl_cmb, cl_yy)
    assert set(rd.keys()) == set(td.keys())
    for block in ("total", "cmb", "foreground", "noise"):
        for pair in rd[block]:
            np.testing.assert_allclose(
                td[block][pair], rd[block][pair], rtol=2e-5, atol=1e-12,
                err_msg=f"{block} {pair}")


def test_model_vec_reference_broken_pinned():
    """The reference fg_fit constructs all_params with Aps_{nu} keys but
    its fg_cl reads Aps_{i}_{j} (and A_dust/A_ksz are missing), so
    model_vec raises KeyError on fg_fit's own parameter vector; the
    orphics_tpu model_vec runs with the fg_cl convention."""
    import orphics.maps as rmaps
    freqs = [93., 145.]
    all_params = ([f"Aps_{nu}" for nu in freqs]
                  + [f"rN_{nu}" for nu in freqs]
                  + ["Acib_150", "alpha_cib", "Atsz", "A_cmb", "Aatm_corr",
                     "Adust_353", "beta_dust", "alpha_dust"])
    vals = [3., 3., 1., 1., 4.9, 3.5, 1., 1., 0., 10., 1.6, 2.42]
    beams = [lambda x: rmaps.gauss_beam(x, 2.2),
             lambda x: rmaps.gauss_beam(x, 1.4)]
    clyy = rfg.power_y_template(ELLS, silence=True)
    with pytest.raises(KeyError):
        rfg.model_vec(all_params, vals, ELLS, freqs, [8., 10.], beams,
                      [0., 0.], [0., 0.], ELLS * 0 + 1.0, clyy)
    # ours: same call shape, fg_cl-convention keys, runs
    p = tfg._default_param_template(freqs)
    names = list(p.keys())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vec = tfg.model_vec(names, [p[n] for n in names], ELLS, freqs,
                            [8., 10.], beams, [0., 0.], [0., 0.],
                            ELLS * 0 + 1.0, clyy)
    assert vec.shape == (3 * ELLS.size,)
    assert np.all(np.isfinite(vec))


def test_quick_fit_reference_broken_ours_recovers():
    """Reference quick_fit -> fg_fit -> model_vec KeyErrors (see above).
    The orphics_tpu quick_fit recovers injected amplitudes on synthetic
    two-band spectra."""
    import itertools
    from orphics_tpu.ops.fourier import gauss_beam
    ell = np.arange(30, 4000, 1).astype(float)
    freqs = np.array([93., 145.])
    dT = [8.0, 10.0]
    lknees = [0.0, 0.0]
    alphas = [-3.5, -3.5]
    th = t_default_theory()
    beam_fns = [lambda x: np.asarray(gauss_beam(x, 2.2), dtype=float),
                lambda x: np.asarray(gauss_beam(x, 1.4), dtype=float)]
    truth = tfg._default_param_template(freqs)
    # realistic C_l-unit amplitudes (uK^2): Poisson/CIB pivots of a few
    # 1e-6 are comparable to the tSZ and the white-noise floors; huge
    # values would drown the tSZ shape and leave Atsz prior-dominated
    truth.update({"A_cmb": 1.0, "Atsz": 1.3, "Acib_150": 3.5e-6,
                  "A_dust": 0.0, "A_ksz": 0.0, "Aps_0_0": 4e-6,
                  "Aps_0_1": 2e-6, "Aps_1_1": 6e-6})
    cltt = (np.asarray(th.lCl('TT', ell))
            + tfg.power_ksz_reion(ell) + tfg.power_ksz_late(ell))
    clyy = tfg.power_y_template(ell, silence=True)
    cl_dict = {}
    for i, j in itertools.combinations_with_replacement(range(2), 2):
        mod = ((truth["A_cmb"] * cltt
                + tfg.fg_cl(ell, truth, i, j, clyy, freqs))
               * beam_fns[i](ell) * beam_fns[j](ell))
        sig_i = dT[i] * truth[f"rN_{int(freqs[i])}"]
        mod = mod + tfg.get_noise(ell, i, j, sig_i,
                                  dT[j] * truth[f"rN_{int(freqs[j])}"],
                                  lknees, alphas, 0.0)
        cl_dict[(i, j)] = mod
    # the reference stack cannot run this fit at all
    with pytest.raises(KeyError):
        rfg.quick_fit(ell, cl_dict, freqs, dT, [2.2, 1.4], lknees,
                      alphas, 0.4, verbose=False, plot=False)
    # fix the noise scales: with noiseless 2-band data, (rN, Aps, Atsz)
    # are near-degenerate (flat C_l vs flat C_l), and the reference-
    # default Atsz prior would win the flat direction
    fixed = {"alpha_cib": 3.5, "Aatm_corr": 0.0, "beta_dust": 1.6,
             "A_dust": 0.0, "A_ksz": 0.0, "rN_93": 1.0, "rN_145": 1.0}
    best, errs, sol = tfg.quick_fit(ell, cl_dict, freqs, dT,
                                    beam_fns, lknees, alphas, 0.4,
                                    fixed_params=fixed)
    assert sol.success
    np.testing.assert_allclose(best["A_cmb"], 1.0, atol=0.02)
    np.testing.assert_allclose(best["Atsz"], 1.3, atol=0.15)
    np.testing.assert_allclose(best["Aps_0_0"], 4e-6, atol=4e-7)


# ---------------------------------------------------------------------
# ILC forecasts (reference :492-580) — the slow end-to-end legs
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def ilc_nofg():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = rfg.ilc_power([5.1, 2.2, 1.4, 1.0, 0.9],
                          [36., 8., 10., 22., 54.], FREQS5, FLUX5,
                          include_fg=False, total=True)
        t = tfg.ilc_power([5.1, 2.2, 1.4, 1.0, 0.9],
                          [36., 8., 10., 22., 54.], FREQS5, FLUX5,
                          include_fg=False, total=True)
    return r, t


def test_ilc_power_no_fg_matches_reference(ilc_nofg):
    (rell, rn), (tell, tn) = ilc_nofg
    np.testing.assert_array_equal(rell, tell)
    sel = (rell >= 2) & (rell < 20000)
    np.testing.assert_allclose(tn[sel], rn[sel], rtol=2e-4)


def test_get_ilc_noise_so_matches_reference():
    """Full end-to-end SO forecast WITH foregrounds. The only knowingly
    divergent ingredient is the radio cross-power unit conversion
    (pinned above, ~40% on that subdominant component), which moves the
    total ILC noise by <5%; everything else agrees at 1e-4."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rell, rn = rfg.get_ilc_noise('so')
        tell, tn = tfg.get_ilc_noise('so')
    np.testing.assert_array_equal(rell, tell)
    sel = (rell >= 30) & (rell < 20000)
    r = np.abs(tn[sel] - rn[sel]) / (np.abs(rn[sel]) + 1e-300)
    assert r.max() < 0.05, r.max()
    # where the beam-deconvolved noise dominates, the (constant-C_l)
    # radio term is negligible and the two agree tightly
    hi = (rell >= 9000) & (rell < 20000)
    np.testing.assert_allclose(tn[hi], rn[hi], rtol=2e-3)


def test_get_ilc_noise_hd_config_matches_reference():
    """The hd channel table is derived, not copied: noises = s4*0.5/1.8
    (reference :562). Assert the derived inputs agree."""
    s4 = np.array([12.4, 2.0, 2.0, 6.9, 16.7])
    freqs = np.array([39., 93., 145., 225., 280.])
    np.testing.assert_allclose(s4 * 0.5 / 1.8,
                               [3.4444444444, 0.5555555556, 0.5555555556,
                                1.9166666667, 4.6388888889])
    np.testing.assert_allclose((10. / 60.) * 145. / freqs,
                               [0.61965811966, 0.25985663082, 0.16666666667,
                                0.10740740741, 0.086309523810])


def test_get_official_ilc_noise_matches_reference():
    for exp in ("so", "s4"):
        rell, rn = rfg.get_official_ilc_noise(exp)
        tell, tn = tfg.get_official_ilc_noise(exp)
        np.testing.assert_array_equal(rell, tell)
        np.testing.assert_array_equal(rn, tn)

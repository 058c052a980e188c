"""Self-contained FITS binary-table reader/writer for the parity shim
and test fixtures (plain numpy; no orphics_tpu imports). Implements
just enough of the FITS standard — 2880-byte blocks, 80-char cards, a
single BINTABLE extension with D/E/J/K columns — that fixture files
and the reference's astropy reads share ONLY the bytes on disk with
the code under test."""
import numpy as np

BLOCK = 2880

_TFORM = {"f8": "D", "f4": "E", "i4": "J", "i8": "K"}
_DTYPE = {"D": ">f8", "E": ">f4", "J": ">i4", "K": ">i8"}


def _card(key, value=None):
    if value is None:
        return f"{key:<80}"[:80]
    if isinstance(value, bool):
        body = f"{key:<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, (int, np.integer)):
        body = f"{key:<8}= {int(value):>20}"
    elif isinstance(value, str):
        body = f"{key:<8}= '{value:<8}'"
    else:
        raise TypeError(type(value))
    return f"{body:<80}"[:80]


def _header_block(cards):
    text = "".join(cards) + f"{'END':<80}"
    pad = (-len(text)) % BLOCK
    return (text + " " * pad).encode("ascii")


def _pad_data(raw):
    return raw + b"\x00" * ((-len(raw)) % BLOCK)


def write_bintable(path, cols):
    """Write {name: 1-D array} as primary HDU + one BINTABLE."""
    names = list(cols.keys())
    arrs = [np.asarray(cols[n]) for n in names]
    n = len(arrs[0])
    fields, tforms = [], []
    for name, a in zip(names, arrs):
        code = _TFORM[a.dtype.str.lstrip("<>=|")]
        tforms.append("1" + code)
        fields.append((name, _DTYPE[code]))
    rec = np.zeros(n, dtype=fields)
    for name, a in zip(names, arrs):
        rec[name] = a
    primary = _header_block([_card("SIMPLE", True), _card("BITPIX", 8),
                             _card("NAXIS", 0), _card("EXTEND", True)])
    hdr = [_card("XTENSION", "BINTABLE"), _card("BITPIX", 8),
           _card("NAXIS", 2), _card("NAXIS1", rec.dtype.itemsize),
           _card("NAXIS2", n), _card("PCOUNT", 0), _card("GCOUNT", 1),
           _card("TFIELDS", len(names))]
    for i, (name, tf) in enumerate(zip(names, tforms), start=1):
        hdr.append(_card(f"TTYPE{i}", name))
        hdr.append(_card(f"TFORM{i}", tf))
    with open(path, "wb") as f:
        f.write(primary)
        f.write(_header_block(hdr))
        f.write(_pad_data(rec.tobytes()))


def _read_header(f):
    cards = {}
    while True:
        block = f.read(BLOCK)
        if not block:
            raise EOFError("truncated FITS header")
        text = block.decode("ascii", errors="replace")
        done = False
        for i in range(0, BLOCK, 80):
            card = text[i:i + 80]
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] != "= ":
                continue
            val = card[10:].split("/")[0].strip()
            if val.startswith("'"):
                cards[key] = val.strip("'").strip()
            elif val in ("T", "F"):
                cards[key] = val == "T"
            else:
                try:
                    cards[key] = int(val)
                except ValueError:
                    cards[key] = float(val)
        if done:
            return cards


def read_bintable(path):
    """First BINTABLE extension -> {name: native-endian array}."""
    with open(path, "rb") as f:
        hdr = _read_header(f)                 # primary (NAXIS=0)
        if hdr.get("NAXIS", 0) != 0:
            size = abs(hdr["BITPIX"]) // 8
            for ax in range(1, hdr["NAXIS"] + 1):
                size *= hdr[f"NAXIS{ax}"]
            f.seek((size + (-size) % BLOCK), 1)
        hdr = _read_header(f)
        if hdr.get("XTENSION", "").startswith("BINTABLE") is False:
            raise ValueError("expected BINTABLE extension")
        nfields = hdr["TFIELDS"]
        fields = []
        for i in range(1, nfields + 1):
            tform = hdr[f"TFORM{i}"].strip()
            code = tform.lstrip("0123456789")[0]
            fields.append((hdr[f"TTYPE{i}"], _DTYPE[code]))
        rec = np.frombuffer(f.read(hdr["NAXIS1"] * hdr["NAXIS2"]),
                            dtype=fields, count=hdr["NAXIS2"])
    return {name: np.ascontiguousarray(rec[name]).astype(
        rec[name].dtype.newbyteorder("=")) for name, _ in fields}

"""BB frame construction tables (EN 302 755 section 5 / mode adaptation).

The reference builds BB frames byte-serially with two CRC-8 implementations
(lib/bbheaderbch_bb_impl.cc:222-270 bit-serial for the header, :399-417 +
:701-719 table-driven for the TS sync replacement).  CRC-8 is GF(2)-linear,
so both become small constant matrices and the whole stage is one gather +
one mod-2 matmul on TPU.

Stream contract: a transmit step processes frames whose TS byte phase is
known statically.  Each output byte slot consumes exactly one input byte;
slots at packet phase 0 carry the CRC-8 of the previous 187 bytes instead of
the 0x47 sync byte, so steps take 187 bytes of left context
(the executor carries that tail between steps).
"""
import functools

import numpy as np

from .sequences import bb_scrambler
from ..config import InBand, InputMode, T2Config

CRC_POLY = 0xAB  # reflected representation used bit-serially


def _crc8_byte_table() -> np.ndarray:
    """256-entry CRC-8 step table (poly 0xD5 MSB-first == reflected 0xAB);
    mirrors reference build_crc8_table (:222-240)."""
    tab = np.empty(256, dtype=np.uint8)
    for i in range(256):
        crc = 0
        for j in range(7, -1, -1):
            bit = (i >> j) & 1
            if bit ^ ((crc >> 7) & 1):
                crc = ((crc << 1) ^ 0xD5) & 0xFF
            else:
                crc = (crc << 1) & 0xFF
        tab[i] = crc
    return tab


@functools.lru_cache(maxsize=1)
def packet_crc_matrix() -> np.ndarray:
    """M uint8 (187*8, 8): CRC byte (bit 7 first) of a 187-byte packet body
    as a linear function of its bits (MSB-first byte order).

    crc_{j+1} = tab[b_j ^ crc_j]  =>  crc = sum_j T^{187-j}(b_j).
    """
    tab = _crc8_byte_table()
    # T as an 8x8 GF(2) matrix acting on byte bits (bit 7 = MSB).
    def as_bits(v):
        return np.array([(v >> (7 - n)) & 1 for n in range(8)], dtype=np.uint8)

    T = np.stack([as_bits(tab[1 << (7 - n)]) for n in range(8)])  # row n: T(e_n)
    M = np.zeros((187 * 8, 8), dtype=np.uint8)
    power = np.eye(8, dtype=np.uint8)  # T^0
    for j in range(186, -1, -1):
        power = (power @ T) & 1  # T^{187-j}
        M[j * 8 : (j + 1) * 8] = power
    return M


def header_crc8_bits(header72: np.ndarray, hieff: bool) -> np.ndarray:
    """Bit-serial header CRC-8 (reference add_crc8_bits :247-270): 8 bits
    appended LSB-of-state-first."""
    crc = 0
    for bit in header72:
        b = int(bit) ^ (crc & 1)
        crc >>= 1
        if b:
            crc ^= CRC_POLY
    if hieff:
        crc ^= 0x80
    return np.array([(crc >> n) & 1 for n in range(8)], dtype=np.uint8)


def _field_bits(value: int, width: int):
    return [(value >> n) & 1 for n in range(width - 1, -1, -1)]


def header_bits(cfg: T2Config, count: int, padding: int) -> np.ndarray:
    """The 80-bit BB header for a frame starting at TS byte phase ``count``;
    mirrors reference add_bbheader (:272-325)."""
    hieff = cfg.input_mode == InputMode.HIEFF
    ts_gs = 0b11            # TS_GS_TRANSPORT
    bits = [ts_gs >> 1, ts_gs & 1]
    bits += [1]             # sis_mis = single
    bits += [1]             # ccm_acm = CCM
    bits += [0]             # issyi not active
    bits += [0]             # npd not active
    bits += [0, 0]          # ro = 0
    bits += [0] * 8         # ISI (single input stream)
    upl = 188 * 8 if not hieff else 0
    bits += _field_bits(upl, 16)
    dfl = cfg.kbch - 80 - padding
    bits += _field_bits(dfl, 16)
    bits += _field_bits(0x47 if not hieff else 0, 8)
    syncd = 0 if count == 0 else (188 - count) * 8
    bits += _field_bits(syncd, 16)
    hdr = np.array(bits, dtype=np.uint8)
    assert hdr.size == 72
    return np.concatenate([hdr, header_crc8_bits(hdr, hieff)])


def inband_type_b_bits(ts_rate: int) -> np.ndarray:
    """104-bit in-band type B field (reference add_inband_type_b :327-355)."""
    bits = [0, 1]
    bits += [0] * 31   # CELL_ID etc. zeroed
    bits += [0] * 22
    bits += [0] * 2
    bits += [0] * 10
    bits += _field_bits(ts_rate, 27)
    bits += [0] * 10
    out = np.array(bits, dtype=np.uint8)
    assert out.size == 104
    return out


class BBFramePlan:
    """Static index planes mapping a padded TS byte window to BB frame bits.

    For a step of ``n_frames`` FEC frames starting at TS phase 0:
      * input:  ts bytes, shape (187 + n_frames*df_bytes,) uint8
                (the first 187 bytes are carry-over context)
      * frame bits f, position k  =  select(source_kind) gathered via
        ``bit_src``/CRC scatter, XOR ``scramble``.

    The fast path evaluates this as: unpack bits; gather data bits; compute
    all packet CRCs with one mod-2 matmul; scatter CRC bits; XOR scrambler.
    """

    def __init__(self, cfg: T2Config, n_frames: int, strict: bool = True):
        if cfg.input_mode != InputMode.NORMAL:
            raise NotImplementedError("HIEFF input mode not yet supported")
        self.cfg = cfg
        self.n_frames = n_frames
        nbytes = cfg.df_bytes
        inband = cfg.in_band == InBand.ON
        if inband:
            # in-band frames have 104 bits less payload on the fec_blocks
            # cadence; keep the stream phase math simple by requiring it off
            # for now (reference example runs with INBAND_OFF too).
            raise NotImplementedError("in-band type B not yet supported")
        total_bytes = n_frames * nbytes
        if strict and total_bytes % 188 != 0:
            raise ValueError(
                f"n_frames*df_bytes ({total_bytes}) must be a multiple of 188 "
                f"for a phase-invariant plan; pick n_frames as a multiple of "
                f"{188 // np.gcd(nbytes, 188)}")

        counts = np.arange(total_bytes) % 188
        self.sync_slots = np.where(counts == 0)[0]  # global byte slots
        # packet body for sync slot s: padded bytes [s .. s+186]
        self.n_packets = len(self.sync_slots)

        # per-frame header bits (static; depends on each frame's start phase)
        headers = np.empty((n_frames, 80), dtype=np.uint8)
        for f in range(n_frames):
            count = (f * nbytes) % 188
            headers[f] = header_bits(cfg, count, 0)
        self.headers = headers

        # data-field source: frame f, byte j  <-  padded input byte
        # 187 + f*nbytes + j ; bit b is MSB-first.
        self.df_byte_src = (187 + np.arange(total_bytes)).reshape(
            n_frames, nbytes).astype(np.int32)
        # which DF slots must be overwritten with a packet CRC, and with
        # which packet index
        slot_frame = self.sync_slots // nbytes
        slot_byte = self.sync_slots % nbytes
        self.crc_slot_frame = slot_frame.astype(np.int32)
        self.crc_slot_byte = slot_byte.astype(np.int32)
        # packet body byte indices into the padded input
        self.packet_body_src = (self.sync_slots[:, None]
                                + np.arange(187)[None, :]).astype(np.int32)
        self.crc_matrix = packet_crc_matrix()
        self.scramble = bb_scrambler()[: cfg.kbch].copy()

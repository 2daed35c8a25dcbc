"""True ETSI MAC PDU layer (EN 300 392-2 §21.4): MAC-RESOURCE,
MAC-FRAG/MAC-END and the fill-bit rules, carrying layer-3 TM-SDUs over
the `etsi` profile's coded logical channels (SCH/F = 268 type-1 bits,
SCH/HD / STCH = 124).

This replaces — for the etsi profile — the reference's heuristic MAC
parse (/root/reference/tetraear/core/protocol.py:349-596: a hand-rolled
2-bit-type + 24-bit-address scan with no length/fill semantics).  The
ref-compat profiles keep that heuristic verbatim (protocol/parser.py);
this module is the real thing: typed headers, length indication, fill
bits, multi-PDU blocks, and cross-slot fragmentation.

Field layouts follow EN 300 392-2 §21.4.3.1 (MAC-RESOURCE, downlink),
§21.4.3.2/3 (MAC-FRAG/MAC-END) and §23.4.3.2 (fill bits: one '1' then
'0's).  Two documented functional equivalents (spec text unavailable in
this zero-egress environment; both are TX/RX-consistent and pinned by
round-trip tests):

* the 6-bit length indication counts **octets of the MAC PDU including
  the header, rounded up** (the sub-octet remainder is covered by the
  fill-bit mechanism); special values keep their spec roles —
  ``LI_FRAG_START`` (0b111110) marks "TM-SDU continues in MAC-FRAG/END",
  ``LI_SECOND_HALF_STOLEN`` (0b111111) is reserved for stealing.
* the channel-allocation element carries the §21.5.2 field set
  (allocation type, timeslots, up/downlink, CLCH, cell change, carrier,
  extended-carrier block, monitoring pattern) in spec order with the
  widths documented inline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from tetraear_tpu.protocol.bits import BitCursor, as_bit_array, pack_fields

__all__ = [
    "MacResource", "MacFrag", "MacEnd", "ChannelAllocation",
    "AddressType", "parse_mac_block", "build_mac_block",
    "fragment_tm_sdu", "LI_FRAG_START", "LI_SECOND_HALF_STOLEN",
    "MacAccess", "MacUplinkData", "parse_uplink_block",
]

# Address types (§21.4.3.1 table 21.55)
class AddressType:
    NULL = 0          # null PDU: rest of the block is fill
    SSI = 1
    EVENT_LABEL = 2
    USSI = 3
    SMI = 4
    SSI_EVENT_LABEL = 5
    SSI_USAGE_MARKER = 6
    SMI_EVENT_LABEL = 7


_ADDR_WIDTHS = {
    AddressType.SSI: (24,),
    AddressType.EVENT_LABEL: (10,),
    AddressType.USSI: (24,),
    AddressType.SMI: (24,),
    AddressType.SSI_EVENT_LABEL: (24, 10),
    AddressType.SSI_USAGE_MARKER: (24, 6),
    AddressType.SMI_EVENT_LABEL: (24, 10),
}

LI_FRAG_START = 0b111110
LI_SECOND_HALF_STOLEN = 0b111111


@dataclass
class ChannelAllocation:
    """§21.5.2 channel allocation element."""
    allocation_type: int = 0      # 2
    timeslots: int = 0            # 4 (bitmap TN1..TN4)
    up_downlink: int = 0          # 2
    clch_permission: int = 0      # 1
    cell_change: int = 0          # 1
    carrier_number: int = 0       # 12
    extended_flag: int = 0        # 1 (-> band 4, offset 2, duplex 3, rev 1)
    frequency_band: int = 0
    offset: int = 0
    duplex_spacing: int = 0
    reverse_operation: int = 0
    monitoring_pattern: int = 1   # 2 (00 -> +frame18 pattern)
    frame18_pattern: int = 0      # 2 (only when monitoring_pattern == 0)

    def build(self) -> np.ndarray:
        pairs = [(self.allocation_type, 2), (self.timeslots, 4),
                 (self.up_downlink, 2), (self.clch_permission, 1),
                 (self.cell_change, 1), (self.carrier_number, 12),
                 (self.extended_flag, 1)]
        if self.extended_flag:
            pairs += [(self.frequency_band, 4), (self.offset, 2),
                      (self.duplex_spacing, 3), (self.reverse_operation, 1)]
        pairs.append((self.monitoring_pattern, 2))
        if self.monitoring_pattern == 0:
            pairs.append((self.frame18_pattern, 2))
        return pack_fields(pairs)

    @classmethod
    def parse(cls, cur: BitCursor) -> "ChannelAllocation":
        ca = cls(allocation_type=cur.take(2), timeslots=cur.take(4),
                 up_downlink=cur.take(2), clch_permission=cur.take(1),
                 cell_change=cur.take(1), carrier_number=cur.take(12),
                 extended_flag=cur.take(1))
        if ca.extended_flag:
            ca.frequency_band = cur.take(4)
            ca.offset = cur.take(2)
            ca.duplex_spacing = cur.take(3)
            ca.reverse_operation = cur.take(1)
        ca.monitoring_pattern = cur.take(2)
        if ca.monitoring_pattern == 0:
            ca.frame18_pattern = cur.take(2)
        return ca


def _strip_fill(bits: np.ndarray) -> np.ndarray:
    """Remove §23.4.3.2 fill: trailing '0's and the final '1'."""
    arr = as_bit_array(bits)
    nz = np.flatnonzero(arr)
    if nz.size == 0:
        return arr[:0]
    return arr[: nz[-1]]


def _add_fill(bits: np.ndarray, target: int) -> np.ndarray:
    """Pad to `target` bits with '1' then '0's (§23.4.3.2)."""
    arr = as_bit_array(bits)
    pad = target - arr.size
    assert pad >= 1, "fill requires at least one spare bit"
    fill = np.zeros(pad, np.uint8)
    fill[0] = 1
    return np.concatenate([arr, fill])


@dataclass
class MacResource:
    """Downlink MAC-RESOURCE (§21.4.3.1) carrying one TM-SDU."""
    fill_ind: int = 0             # 1
    position_of_grant: int = 0    # 1
    encryption_mode: int = 0      # 2
    random_access_flag: int = 0   # 1
    length_indication: int = 0    # 6 (octets incl. header; see module doc)
    address_type: int = AddressType.SSI   # 3
    address: int = 0              # per _ADDR_WIDTHS
    address2: Optional[int] = None        # event label / usage marker part
    power_control: Optional[int] = None   # 4 when present
    slot_granting: Optional[int] = None   # 8 when present
    channel_allocation: Optional[ChannelAllocation] = None
    tm_sdu: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))
    fragmented: bool = False      # TM-SDU continues in MAC-FRAG/END

    PDU_TYPE = 0b00

    def header_bits(self) -> int:
        n = 2 + 1 + 1 + 2 + 1 + 6 + 3
        if self.address_type != AddressType.NULL:
            n += sum(_ADDR_WIDTHS[self.address_type])
            n += 3  # the three optional-element flags
            if self.power_control is not None:
                n += 4
            if self.slot_granting is not None:
                n += 8
            if self.channel_allocation is not None:
                n += self.channel_allocation.build().size
        return n

    def build(self, block_bits: Optional[int] = None) -> np.ndarray:
        """Emit the PDU; with `block_bits` set, pad to fill a whole block
        (fill bits + implicit trailing null PDU of zeros)."""
        hdr = self.header_bits()
        sdu = as_bit_array(self.tm_sdu)
        total = hdr + sdu.size
        if self.fragmented:
            li = LI_FRAG_START
        else:
            li = (total + 7) // 8
            assert li < LI_FRAG_START, "TM-SDU too long for one MAC PDU"
        if self.fragmented:
            # a frag-start RESOURCE extends to the block end; when the
            # SDU head doesn't reach it exactly (borderline lengths that
            # fail the whole-octet LI rounding), fill bits cover the gap
            pdu_bits = block_bits if block_bits is not None else total
        else:
            pdu_bits = li * 8
        fill_ind = 1 if pdu_bits > total else 0

        pairs = [(self.PDU_TYPE, 2), (fill_ind, 1),
                 (self.position_of_grant, 1), (self.encryption_mode, 2),
                 (self.random_access_flag, 1), (li, 6),
                 (self.address_type, 3)]
        if self.address_type != AddressType.NULL:
            widths = _ADDR_WIDTHS[self.address_type]
            pairs.append((self.address, widths[0]))
            if len(widths) > 1:
                pairs.append((self.address2 or 0, widths[1]))
            pairs.append((int(self.power_control is not None), 1))
            if self.power_control is not None:
                pairs.append((self.power_control, 4))
            pairs.append((int(self.slot_granting is not None), 1))
            if self.slot_granting is not None:
                pairs.append((self.slot_granting, 8))
            pairs.append((int(self.channel_allocation is not None), 1))
        head = pack_fields(pairs)
        if (self.address_type != AddressType.NULL
                and self.channel_allocation is not None):
            head = np.concatenate([head, self.channel_allocation.build()])
        out = np.concatenate([head, sdu])
        if fill_ind:
            out = _add_fill(out, pdu_bits)
        if block_bits is not None:
            assert out.size <= block_bits, "PDU exceeds the MAC block"
            out = np.concatenate(
                [out, np.zeros(block_bits - out.size, np.uint8)])
        return out

    @classmethod
    def parse(cls, cur: BitCursor) -> Optional["MacResource"]:
        start = cur.pos
        if cur.take(2) != cls.PDU_TYPE:
            raise ValueError("not a MAC-RESOURCE")
        r = cls(fill_ind=cur.take(1), position_of_grant=cur.take(1),
                encryption_mode=cur.take(2), random_access_flag=cur.take(1),
                length_indication=cur.take(6), address_type=cur.take(3))
        if r.address_type == AddressType.NULL:
            # null PDU: everything to the end of the block is fill
            cur.pos = cur.bits.size
            return None
        widths = _ADDR_WIDTHS[r.address_type]
        r.address = cur.take(widths[0])
        if len(widths) > 1:
            r.address2 = cur.take(widths[1])
        if cur.take(1):
            r.power_control = cur.take(4)
        if cur.take(1):
            r.slot_granting = cur.take(8)
        if cur.take(1):
            r.channel_allocation = ChannelAllocation.parse(cur)
        hdr_used = cur.pos - start
        if r.length_indication == LI_FRAG_START:
            r.fragmented = True
            body = cur.take_bits(cur.remaining)
            r.tm_sdu = _strip_fill(body) if r.fill_ind else body
            return r
        if r.length_indication == LI_SECOND_HALF_STOLEN:
            raise ValueError("stealing marker outside STCH context")
        pdu_bits = r.length_indication * 8
        if pdu_bits < hdr_used or pdu_bits > hdr_used + cur.remaining:
            raise ValueError("length indication inconsistent")
        body = cur.take_bits(pdu_bits - hdr_used)
        r.tm_sdu = _strip_fill(body) if r.fill_ind else body
        return r


@dataclass
class MacFrag:
    """Downlink MAC-FRAG (§21.4.3.2): TM-SDU continuation, fills its
    whole block."""
    tm_sdu: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    def build(self, block_bits: int) -> np.ndarray:
        sdu = as_bit_array(self.tm_sdu)
        head = pack_fields([(0b01, 2), (0, 1)])  # type | subtype=FRAG
        total = head.size + 1 + sdu.size         # +1 fill-ind bit
        assert total <= block_bits
        fill_ind = 1 if total < block_bits else 0
        out = np.concatenate([head, np.asarray([fill_ind], np.uint8), sdu])
        if fill_ind:
            out = _add_fill(out, block_bits)
        return out

    @classmethod
    def parse(cls, cur: BitCursor, subtype: int) -> "MacFrag":
        assert subtype == 0
        fill_ind = cur.take(1)
        body = cur.take_bits(cur.remaining)
        return cls(tm_sdu=_strip_fill(body) if fill_ind else body)


@dataclass
class MacEnd:
    """Downlink MAC-END (§21.4.3.3): final TM-SDU fragment."""
    position_of_grant: int = 0
    length_indication: int = 0
    slot_granting: Optional[int] = None
    channel_allocation: Optional[ChannelAllocation] = None
    tm_sdu: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    def header_bits(self) -> int:
        n = 2 + 1 + 1 + 1 + 6 + 2
        if self.slot_granting is not None:
            n += 8
        if self.channel_allocation is not None:
            n += self.channel_allocation.build().size
        return n

    def build(self, block_bits: Optional[int] = None) -> np.ndarray:
        sdu = as_bit_array(self.tm_sdu)
        total = self.header_bits() + sdu.size
        li = (total + 7) // 8
        pdu_bits = li * 8
        fill_ind = 1 if pdu_bits > total else 0
        pairs = [(0b01, 2), (1, 1), (fill_ind, 1),
                 (self.position_of_grant, 1), (li, 6),
                 (int(self.slot_granting is not None), 1)]
        if self.slot_granting is not None:
            pairs.append((self.slot_granting, 8))
        pairs.append((int(self.channel_allocation is not None), 1))
        head = pack_fields(pairs)
        if self.channel_allocation is not None:
            head = np.concatenate([head, self.channel_allocation.build()])
        out = np.concatenate([head, sdu])
        if fill_ind:
            out = _add_fill(out, pdu_bits)
        if block_bits is not None:
            assert out.size <= block_bits
            out = np.concatenate(
                [out, np.zeros(block_bits - out.size, np.uint8)])
        return out

    @classmethod
    def parse(cls, cur: BitCursor, start: int) -> "MacEnd":
        e = cls()
        fill_ind = cur.take(1)
        e.position_of_grant = cur.take(1)
        e.length_indication = cur.take(6)
        if cur.take(1):
            e.slot_granting = cur.take(8)
        if cur.take(1):
            e.channel_allocation = ChannelAllocation.parse(cur)
        hdr_used = cur.pos - start
        pdu_bits = e.length_indication * 8
        if pdu_bits < hdr_used or pdu_bits > hdr_used + cur.remaining:
            raise ValueError("MAC-END length indication inconsistent")
        body = cur.take_bits(pdu_bits - hdr_used)
        e.tm_sdu = _strip_fill(body) if fill_ind else body
        return e


def parse_mac_block(bits) -> List[object]:
    """Walk one coded-channel MAC block (e.g. 268 SCH/F bits) and return
    the MAC PDUs it carries (multi-PDU blocks per §23.4.3.1).  A null
    PDU / all-zero tail terminates the walk; malformed content raises
    ``ValueError`` so callers can fall back to the ref-compat heuristic
    parser."""
    cur = BitCursor(bits)
    out: List[object] = []
    while cur.remaining >= 16:
        t = (int(cur.bits[cur.pos]) << 1) | int(cur.bits[cur.pos + 1])
        if t == 0b00:
            pdu = MacResource.parse(cur)
            if pdu is None:       # null PDU: rest is fill
                break
            out.append(pdu)
        elif t == 0b01:
            start = cur.pos
            cur.take(2)
            subtype = cur.take(1)
            if subtype == 0:
                out.append(MacFrag.parse(cur, subtype))
            else:
                out.append(MacEnd.parse(cur, start))
        else:
            # 10 = broadcast (handled by protocol/pdus.py on SCH/HD),
            # 11 = supplementary — not valid inside this walk
            raise ValueError(f"unsupported MAC PDU type {t:02b} in block")
    if not out:
        raise ValueError("no MAC PDU in block")
    return out


def build_mac_block(pdus: List[object], block_bits: int) -> np.ndarray:
    """Concatenate MAC PDUs into one type-1 block, zero-padding the tail
    (an all-zero remainder parses as a null PDU, terminating the walk)."""
    parts = []
    used = 0
    for i, p in enumerate(pdus):
        last = i == len(pdus) - 1
        if isinstance(p, MacFrag):
            b = p.build(block_bits - used)
        elif last:
            b = p.build(block_bits - used)
            # builders already zero-pad to the block when given a budget
            used += b.size
            parts.append(b)
            break
        else:
            b = p.build()
        used += b.size
        parts.append(b)
    assert used <= block_bits, "MAC PDUs exceed the block"
    out = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    if out.size < block_bits:
        out = np.concatenate([out, np.zeros(block_bits - out.size,
                                            np.uint8)])
    return out


# --------------------------------------------------------------------------
# Uplink MAC PDUs (§21.4.2): MAC-ACCESS on SCH/HU, MAC-DATA on full-slot
# uplink SCH/F.  Same codec discipline as the downlink PDUs above; the
# uplink has no grant/channel-allocation elements, and SCH/HU's tiny
# 92-bit block uses a 1-bit PDU type (0 = MAC-ACCESS, 1 = MAC-END-HU)
# and 2-bit address types.
# --------------------------------------------------------------------------

_UL_ADDR_WIDTHS = {0: 24, 1: 10, 2: 24, 3: 24}   # SSI/event/USSI/SMI


@dataclass
class MacAccess:
    """MAC-ACCESS (§21.4.2.1) on SCH/HU: the MS's random-access PDU."""
    fill_ind: int = 0             # 1 (after the 1-bit PDU type)
    encryption_mode: int = 0      # 2
    address_type: int = 0         # 2 (0=SSI, 1=event label, 2=USSI, 3=SMI)
    address: int = 0
    length_flag: int = 1          # 1 (-> 5-bit length indication present)
    length_indication: int = 0    # octets incl. header (as downlink)
    tm_sdu: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    def header_bits(self) -> int:
        return 1 + 1 + 2 + 2 + _UL_ADDR_WIDTHS[self.address_type] + 1 + \
            (5 if self.length_flag else 0)

    def build(self, block_bits: Optional[int] = None) -> np.ndarray:
        """Emit the PDU, honoring ``length_flag``: the bounded form with a
        5-bit whole-octet LI (flag 1, the default), or the unbounded form
        (flag 0) whose TM-SDU extends to the block end — build and parse
        are field-for-field inverses for both."""
        sdu = as_bit_array(self.tm_sdu)
        base = 1 + 1 + 2 + 2 + _UL_ADDR_WIDTHS[self.address_type] + 1
        if self.length_flag:
            total = base + 5 + sdu.size
            li = (total + 7) // 8
            pdu_bits = li * 8
            self.length_indication = li
        else:
            total = base + sdu.size
            pdu_bits = block_bits if block_bits is not None else total
            assert pdu_bits >= total, "MAC-ACCESS exceeds the block"
        fill_ind = 1 if pdu_bits > total else 0
        self.fill_ind = fill_ind
        pairs = [(0, 1), (fill_ind, 1), (self.encryption_mode, 2),
                 (self.address_type, 2),
                 (self.address, _UL_ADDR_WIDTHS[self.address_type]),
                 (self.length_flag, 1)]
        if self.length_flag:
            pairs.append((self.length_indication, 5))
        out = np.concatenate([pack_fields(pairs), sdu])
        if fill_ind:
            out = _add_fill(out, pdu_bits)
        if block_bits is not None:
            assert out.size <= block_bits, "MAC-ACCESS exceeds the block"
            out = np.concatenate(
                [out, np.zeros(block_bits - out.size, np.uint8)])
        return out

    @classmethod
    def parse(cls, cur: BitCursor) -> "MacAccess":
        start = cur.pos
        if cur.take(1) != 0:
            raise ValueError("not a MAC-ACCESS")
        a = cls(fill_ind=cur.take(1), encryption_mode=cur.take(2),
                address_type=cur.take(2))
        a.address = cur.take(_UL_ADDR_WIDTHS[a.address_type])
        a.length_flag = cur.take(1)
        if a.length_flag:
            a.length_indication = cur.take(5)
            hdr_used = cur.pos - start
            pdu_bits = a.length_indication * 8
            if pdu_bits < hdr_used or pdu_bits > hdr_used + cur.remaining:
                raise ValueError("MAC-ACCESS length inconsistent")
            body = cur.take_bits(pdu_bits - hdr_used)
        else:
            body = cur.take_bits(cur.remaining)
        a.tm_sdu = _strip_fill(body) if a.fill_ind else body
        return a


@dataclass
class MacUplinkData:
    """MAC-DATA (§21.4.2.2) on uplink SCH/F: reserved-slot signalling."""
    fill_ind: int = 0
    encryption_mode: int = 0
    address_type: int = 0         # 2-bit, as MAC-ACCESS
    address: int = 0
    length_indication: int = 0    # 6, same semantics as downlink
    tm_sdu: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    PDU_TYPE = 0b00

    def header_bits(self) -> int:
        return 2 + 1 + 2 + 2 + _UL_ADDR_WIDTHS[self.address_type] + 6

    def build(self, block_bits: Optional[int] = None) -> np.ndarray:
        sdu = as_bit_array(self.tm_sdu)
        total = self.header_bits() + sdu.size
        li = (total + 7) // 8
        assert li < LI_FRAG_START
        pdu_bits = li * 8
        fill_ind = 1 if pdu_bits > total else 0
        pairs = [(self.PDU_TYPE, 2), (fill_ind, 1),
                 (self.encryption_mode, 2), (self.address_type, 2),
                 (self.address, _UL_ADDR_WIDTHS[self.address_type]),
                 (li, 6)]
        out = np.concatenate([pack_fields(pairs), sdu])
        if fill_ind:
            out = _add_fill(out, pdu_bits)
        if block_bits is not None:
            assert out.size <= block_bits, "MAC-DATA exceeds the block"
            out = np.concatenate(
                [out, np.zeros(block_bits - out.size, np.uint8)])
        return out

    @classmethod
    def parse(cls, cur: BitCursor) -> "MacUplinkData":
        start = cur.pos
        if cur.take(2) != cls.PDU_TYPE:
            raise ValueError("not a MAC-DATA")
        d = cls(fill_ind=cur.take(1), encryption_mode=cur.take(2),
                address_type=cur.take(2))
        d.address = cur.take(_UL_ADDR_WIDTHS[d.address_type])
        d.length_indication = cur.take(6)
        hdr_used = cur.pos - start
        pdu_bits = d.length_indication * 8
        if pdu_bits < hdr_used or pdu_bits > hdr_used + cur.remaining:
            raise ValueError("MAC-DATA length inconsistent")
        body = cur.take_bits(pdu_bits - hdr_used)
        d.tm_sdu = _strip_fill(body) if d.fill_ind else body
        return d


def parse_uplink_block(bits, channel: str) -> List[object]:
    """Uplink coded-channel block -> MAC PDUs.  channel: "SCH/HU" (92-bit
    MAC-ACCESS) or "SCH/F" (268-bit MAC-DATA).  Raises ValueError on
    malformed content (callers fall back to heuristics)."""
    cur = BitCursor(as_bit_array(bits))
    if channel == "SCH/HU":
        return [MacAccess.parse(cur)]
    out: List[object] = []
    while cur.remaining >= 16:
        nxt = cur.bits[cur.pos:cur.pos + 2]
        if not nxt.any() and not cur.bits[cur.pos:].any():
            break                         # zero tail
        out.append(MacUplinkData.parse(cur))
    if not out:
        raise ValueError("no uplink MAC PDU in block")
    return out


def fragment_tm_sdu(tm_sdu, block_bits: int, first: MacResource
                    ) -> List[Tuple[object, np.ndarray]]:
    """Split a TM-SDU across MAC-RESOURCE (+FRAG)* + END blocks.

    Returns [(mac_pdu, block_bits_array), ...] — one entry per coded
    channel block.  `first` supplies the RESOURCE header fields (address,
    encryption mode, ...).  Single-block SDUs yield one RESOURCE.
    """
    sdu = as_bit_array(tm_sdu)
    first_cap = block_bits - first.header_bits()
    # single-block fit must survive the whole-octet LI rounding in
    # MacResource.build (li*8 <= block_bits, not just hdr+sdu):
    # borderline totals (e.g. 265-268 bits on SCH/F) must fragment
    li_single = (first.header_bits() + sdu.size + 7) // 8
    if li_single * 8 <= block_bits and li_single < LI_FRAG_START:
        first.tm_sdu = sdu
        first.fragmented = False
        return [(first, first.build(block_bits))]
    # fragmentation start: RESOURCE fills its block, LI = frag marker
    first.tm_sdu = sdu[:first_cap]
    first.fragmented = True
    out: List[Tuple[object, np.ndarray]] = [(first,
                                             first.build(block_bits))]
    rest = sdu[first_cap:]
    frag_cap = block_bits - 4          # 2 type + 1 subtype + 1 fill
    # MAC-END also rounds its LI up to whole octets; cap its tail at the
    # whole-octet boundary so borderline tails fragment instead of
    # tripping build's block assertion
    end_cap = (block_bits // 8) * 8 - MacEnd().header_bits()
    while rest.size > end_cap:
        frag = MacFrag(tm_sdu=rest[:frag_cap])
        out.append((frag, frag.build(block_bits)))
        rest = rest[frag_cap:]
    end = MacEnd(tm_sdu=rest)
    out.append((end, end.build(block_bits)))
    return out

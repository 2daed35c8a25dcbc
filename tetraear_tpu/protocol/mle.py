"""MLE layer (EN 300 392-2 §18): protocol-discriminator routing between
the MAC's TM-SDU and the layer-3 entities (MM, CMCE, SNDCP).

For MM/CMCE/SNDCP the MLE service is transparent — the TM-SDU is the
3-bit protocol discriminator followed directly by the entity's PDU
(§18.4.1).  PD=5 addresses the MLE protocol itself (D-NWRK-BROADCAST
etc.), which we surface as opaque bits.

The reference implementation has no layer 3 at all — its "call metadata"
and SDS extraction are byte heuristics over raw MAC payload bytes
(/root/reference/tetraear/core/protocol.py:597-1018).  The etsi profile
routes real PDUs through here instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from tetraear_tpu.protocol.bits import as_bit_array, pack_fields

__all__ = ["PD", "wrap_mle", "unwrap_mle", "MlePdu"]


class PD:
    """3-bit MLE protocol discriminator values (§18.5.21)."""
    RESERVED = 0
    MM = 1
    CMCE = 2
    SNDCP = 4
    MLE = 5
    TETRA_MGMT = 6
    TESTING = 7

    NAMES = {0: "reserved", 1: "MM", 2: "CMCE", 3: "reserved3",
             4: "SNDCP", 5: "MLE", 6: "TETRA-mgmt", 7: "testing"}


@dataclass
class MlePdu:
    """An MLE-protocol (PD=5) or otherwise unrouted SDU, kept opaque."""
    pd: int
    sdu: np.ndarray

    @property
    def pd_name(self) -> str:
        return PD.NAMES.get(self.pd, "?")


def wrap_mle(pd: int, sdu_bits) -> np.ndarray:
    """Prefix an entity PDU with its protocol discriminator."""
    return np.concatenate([pack_fields([(pd, 3)]), as_bit_array(sdu_bits)])


def unwrap_mle(tm_sdu) -> Tuple[int, np.ndarray]:
    """TM-SDU -> (protocol discriminator, entity PDU bits)."""
    bits = as_bit_array(tm_sdu)
    if bits.size < 3:
        raise ValueError("TM-SDU too short for an MLE header")
    pd = (int(bits[0]) << 2) | (int(bits[1]) << 1) | int(bits[2])
    return pd, bits[3:]

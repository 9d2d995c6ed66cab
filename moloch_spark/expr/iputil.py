"""IP value parsing — moloch shorthand (parseIpPort, molochparser.jison).

Supported value shapes (all also inside [lists]):
    10.10.10.10            exact
    10.10.10.10/31         CIDR
    10.10.10 / 10.10 / 10  octet shorthand -> implied /24 /16 /8
    10.10.10.10:443        v4 with port
    :443  or  .443         port only
    1::2 / 1::2/64 / 1::2.443   v6 (port after '.')
    ipv4 / ipv6            address-family tests

Parsing yields (lo, hi) unsigned integer bounds plus an optional port;
the compiler turns those into numeric range predicates on a converted
column, which is how we get parquet row-group skipping on ip ranges
(store numeric, SURVEY §4).
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class IpCond:
    lo: int | None  # inclusive, None = port-only condition
    hi: int | None
    v6: bool
    port: int | None


def parse_ip_port(value: str) -> IpCond:
    s = value.strip().strip('"')
    port: int | None = None

    if (s.startswith(":") and not s.startswith("::")) or s.startswith("."):
        p = s[1:]
        if not p.isdigit():
            raise ValueError(f"{p} not a valid port")
        return IpCond(None, None, False, int(p))

    colons = s.split(":")
    if len(colons) > 2:  # v6
        dots = s.split(".")
        # exactly one '.' with a numeric tail = the v6 port syntax
        # (1::2.443); more dots = an embedded dotted-quad (::ffff:1.2.3.4)
        if len(dots) == 2 and dots[1]:
            if not dots[1].isdigit():
                raise ValueError(f"{dots[1]} not a valid port")
            ip_part, port = dots[0], int(dots[1])
        else:
            ip_part = s
        net = ipaddress.ip_network(ip_part, strict=False)
        return IpCond(
            int(net.network_address), int(net.broadcast_address), True, port
        )

    if len(colons) > 1 and colons[1]:
        if not colons[1].isdigit():
            raise ValueError(f"{colons[1]} not a valid port")
        port = int(colons[1])

    body = colons[0]
    if re.search(r"[^.0-9/]", body):
        raise ValueError(f"{body} not a valid ip")
    slash = body.split("/")
    dots = [d for d in slash[0].split(".") if d != ""]
    prefix = slash[1] if len(slash) > 1 and slash[1] else None
    implied = {4: "32", 3: "24", 2: "16", 1: "8"}
    if len(dots) not in implied:
        raise ValueError(f"{body} not a valid ip")
    octets = (dots + ["0", "0", "0"])[:4]
    ip = ".".join(octets)
    if prefix is None:
        prefix = implied[len(dots)]
    net = ipaddress.ip_network(f"{ip}/{prefix}", strict=False)
    return IpCond(int(net.network_address), int(net.broadcast_address), False, port)


def ip_literal_to_int(value: str) -> int:
    """For gt/lt comparisons: a single address -> integer."""
    return int(ipaddress.ip_address(value.strip().strip('"')))

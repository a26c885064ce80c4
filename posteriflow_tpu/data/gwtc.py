"""GWTC catalog access: event lookup with a built-in table + optional
network fetch.

Reference surface (src/ahsd/data/gwtc_loader.py GWTCLoader, 828 LoC):
GWOSC-API catalog with caching and a hardcoded fallback, event-name -> GPS
lookup used by inference, strain download, synthetic overlap scenarios from
the real catalog. This environment is zero-egress, so the built-in table
(published GWTC-1/2 values) is the primary path and the network paths are
gated on gwpy/requests availability.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

# Published GWTC parameters: gps, source-frame masses [Msun], distance [Mpc]
_BUILTIN_EVENTS: Dict[str, Dict] = {
    "GW150914": dict(gps=1126259462.4, mass_1=35.6, mass_2=30.6,
                     luminosity_distance=440.0, catalog="GWTC-1"),
    "GW151012": dict(gps=1128678900.4, mass_1=23.2, mass_2=13.6,
                     luminosity_distance=1080.0, catalog="GWTC-1"),
    "GW151226": dict(gps=1135136350.6, mass_1=13.7, mass_2=7.7,
                     luminosity_distance=450.0, catalog="GWTC-1"),
    "GW170104": dict(gps=1167559936.6, mass_1=30.8, mass_2=20.0,
                     luminosity_distance=990.0, catalog="GWTC-1"),
    "GW170608": dict(gps=1180922494.5, mass_1=11.0, mass_2=7.6,
                     luminosity_distance=320.0, catalog="GWTC-1"),
    "GW170729": dict(gps=1185389807.3, mass_1=50.2, mass_2=34.0,
                     luminosity_distance=2840.0, catalog="GWTC-1"),
    "GW170809": dict(gps=1186302519.8, mass_1=35.0, mass_2=23.8,
                     luminosity_distance=1030.0, catalog="GWTC-1"),
    "GW170814": dict(gps=1186741861.5, mass_1=30.6, mass_2=25.2,
                     luminosity_distance=600.0, catalog="GWTC-1"),
    "GW170817": dict(gps=1187008882.4, mass_1=1.46, mass_2=1.27,
                     luminosity_distance=40.0, catalog="GWTC-1",
                     event_type="BNS"),
    "GW170818": dict(gps=1187058327.1, mass_1=35.4, mass_2=26.7,
                     luminosity_distance=1060.0, catalog="GWTC-1"),
    "GW170823": dict(gps=1187529256.5, mass_1=39.5, mass_2=29.0,
                     luminosity_distance=1940.0, catalog="GWTC-1"),
    "GW190412": dict(gps=1239082262.2, mass_1=30.1, mass_2=8.3,
                     luminosity_distance=740.0, catalog="GWTC-2"),
    "GW190521": dict(gps=1242442967.4, mass_1=85.0, mass_2=66.0,
                     luminosity_distance=5300.0, catalog="GWTC-2"),
    "GW190814": dict(gps=1249852257.0, mass_1=23.2, mass_2=2.59,
                     luminosity_distance=241.0, catalog="GWTC-2",
                     event_type="NSBH"),
}


class GWTCLoader:
    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = cache_dir
        self._catalog = dict(_BUILTIN_EVENTS)

    def get_event(self, name: str) -> Dict:
        if name in self._catalog:
            return dict(self._catalog[name], name=name)
        fetched = self._fetch_from_gwosc(name)
        if fetched:
            self._catalog[name] = fetched
            return dict(fetched, name=name)
        raise KeyError(
            f"unknown event {name!r}; built-in catalog has "
            f"{sorted(self._catalog)} and GWOSC API is unavailable here")

    def get_event_gps_time(self, name: str) -> float:
        """Event name -> GPS (reference _get_event_gps_time:
        gwtc_loader.py:630)."""
        return float(self.get_event(name)["gps"])

    def list_events(self, catalog: Optional[str] = None) -> List[str]:
        return sorted(n for n, e in self._catalog.items()
                      if catalog is None or e.get("catalog") == catalog)

    def _fetch_from_gwosc(self, name: str) -> Optional[Dict]:
        try:                                   # pragma: no cover
            from gwosc.datasets import event_gps
            return {"gps": float(event_gps(name)), "catalog": "gwosc-api"}
        except Exception:
            return None

    # ── synthetic overlap scenarios from the real catalog ────────────────────
    def synthetic_overlap_scenario(self, names: List[str],
                                   dt_range=(-0.5, 0.5),
                                   seed: int = 0) -> List[Dict]:
        """Overlapping-event parameter sets built from catalog events
        (reference: gwtc_loader.py:700). Sky/orientation randomized; merger
        times offset within dt_range."""
        rng = np.random.default_rng(seed)
        out = []
        for i, n in enumerate(names):
            e = self.get_event(n)
            out.append({
                "mass_1": e["mass_1"], "mass_2": e["mass_2"],
                "luminosity_distance": min(e["luminosity_distance"],
                                           2100.0),
                "ra": float(rng.uniform(0, 2 * np.pi)),
                "dec": float(np.arcsin(rng.uniform(-1, 1))),
                "theta_jn": float(np.arccos(rng.uniform(-1, 1))),
                "psi": float(rng.uniform(0, np.pi)),
                "phase": float(rng.uniform(0, 2 * np.pi)),
                "geocent_time": float(rng.uniform(*dt_range)) if i else 0.0,
                "a1": 0.0, "a2": 0.0,
                "source_event": n,
            })
        return out

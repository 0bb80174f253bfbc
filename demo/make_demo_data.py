"""Deterministically generate the demo corpus (151 creature documents).

The reference demo queries a 151-entry Pokémon JSONL
(/root/reference/demo/demo.py); this generator produces an original corpus
with the same shape (name / hp / info.type / info.weakness /
info.description / moves) so the demo exercises identical code paths —
nested keys, metadata, chunking-adjacent structures — without shipping
third-party data.
"""

from __future__ import annotations

import json
import os

TYPES = [
    ("ember", "tide"), ("tide", "vine"), ("vine", "ember"),
    ("storm", "stone"), ("stone", "gale"), ("gale", "storm"),
    ("frost", "flame"), ("shadow", "light"), ("light", "shadow"),
    ("iron", "rust"),
]

HABITS = [
    "sleeps most of the day curled beneath warm rocks",
    "hunts at dawn along the river shallows",
    "drifts on mountain winds for weeks without landing",
    "burrows deep tunnels and naps in the cool dark",
    "sings at dusk to mark the edge of its territory",
    "hoards shiny pebbles inside hollow trees",
    "glides silently over moonlit fields",
    "dozes in the sun and wakes only to feed",
    "races storms across the open plains",
    "hides in tide pools until the sea calls it back",
    "likes to sleep through the winter in snowdrifts",
    "stalks the forest floor for fallen fruit",
]

MOVES = [
    ("Spark Dash", 40), ("Stone Guard", None), ("Vine Lash", 55),
    ("Tide Crash", 70), ("Ember Bite", 60), ("Gale Cut", 65),
    ("Frost Fang", 65), ("Shadow Step", None), ("Light Burst", 80),
    ("Iron Slam", 90), ("Drift Song", None), ("Burrow", 35),
]

SYLLA = ["ka", "ru", "mo", "ti", "ve", "sha", "lo", "zi", "pon", "dra",
         "ne", "qua", "fel", "gor", "mi"]


def make_documents(count: int = 151):
    docs = []
    for i in range(count):
        name = (
            SYLLA[i % len(SYLLA)] + SYLLA[(i * 7 + 3) % len(SYLLA)]
            + SYLLA[(i * 11 + 5) % len(SYLLA)][:2]
        ).capitalize()
        typ, weak = TYPES[i % len(TYPES)]
        habit = HABITS[(i * 5 + 2) % len(HABITS)]
        moves = []
        for j in range(4):
            mv, dp = MOVES[(i * 3 + j) % len(MOVES)]
            move = {"name": mv, "type": TYPES[(i + j) % len(TYPES)][0]}
            if dp is not None:
                move["dp"] = dp
            moves.append(move)
        docs.append(
            {
                "name": name,
                "shortname": name.lower(),
                "hp": 120 + (i * 13) % 200,
                "info": {
                    "id": i + 1,
                    "type": typ,
                    "weakness": weak,
                    "description": (
                        f"A {typ}-aligned creature that {habit}. "
                        f"It is wary of anything {weak}-aligned."
                    ),
                },
                "moves": moves,
            }
        )
    return docs


def main():
    out = os.path.join(os.path.dirname(__file__), "creatures.jsonl")
    with open(out, "w") as f:
        for doc in make_documents():
            f.write(json.dumps(doc) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

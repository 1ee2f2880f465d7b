"""Engine-wide constants.

Mirrors the reference's public contract (BaderLab/saber,
``saber/constants.py``) where our semantics must match its test goldens:
entity classes, grounding namespaces, pad/unk conventions and the fixed
tagger tensor shapes. Everything else is Ray-Data-engine specific.
"""

# Reserved vocabulary entries (reference: saber/constants.py:18-29).
PAD = "<PAD>"
UNK = "<UNK>"
PAD_VALUE = 0
UNK_VALUE = 1

# Tokens appearing <= NUM_RARE times are replaced with UNK at train time
# (reference: saber/constants.py:27).
NUM_RARE = 1

# Fixed tagger tensor shapes (reference: saber/constants.py:59-68).
PRED_BATCH_SIZE = 256
MAX_SENT_LEN = 100
MAX_CHAR_LEN = 25

# Entity classes served by the reference's pre-trained models
# (reference: saber/constants.py:39-50). ANAT / TRIG exist but are disabled.
ENTITY_CLASSES = ("PRGE", "CHED", "DISO", "LIVB")

# Grounding namespaces per entity class (reference: saber/constants.py:76-80).
NAMESPACES = {
    "CHED": "PubChem Compound",
    "DISO": "Disease Ontology",
    "LIVB": "NCBI Taxonomy",
    "PRGE": "STRING",
}

# Relation predicate assigned to a co-occurring (subject-label, object-label)
# pair when emitting triples. Falls back to COOCCURS for unlisted pairs.
# (The reference's roadmap names relation extraction but does not implement
# it — docs/index.md:10-11 — so these heuristics are engine-defined.)
COOCCURS = "cooccurs_with"
RELATION_PREDICATES = {
    ("PRGE", "DISO"): "associated_with",
    ("DISO", "PRGE"): "associated_with",
    ("CHED", "PRGE"): "interacts_with",
    ("PRGE", "CHED"): "interacts_with",
    ("CHED", "DISO"): "treats_or_causes",
    ("DISO", "CHED"): "treats_or_causes",
    ("LIVB", "PRGE"): "expressed_in",
    ("PRGE", "LIVB"): "expressed_in",
}

"""Deterministic PII snippet generators, one per reference pattern.

Each generator takes a ``numpy.random.Generator`` and returns a string that
exercises one pattern of the bank (``patterns.go:38-179``), valid or a
deliberate near-miss invalid (validator negatives per FIXTURES.md section 1).
"""

from __future__ import annotations

import numpy as np

_FIRST = ("anna", "ben", "carla", "dan", "eva", "felix", "gina", "hugo",
          "iris", "jon", "kira", "liam", "mona", "nick", "olga", "paul")
_DOM = ("mailhub", "corpnet", "webmail", "postbox", "inboxly", "mailster")
_TLD = ("com", "org", "net", "io", "co.uk")


def _digits(rng: np.random.Generator, n: int) -> str:
    return "".join(str(d) for d in rng.integers(0, 10, n))


def gen_email(rng, valid=True) -> str:
    local = rng.choice(_FIRST) + "." + rng.choice(_FIRST) + str(rng.integers(1, 99))
    if not valid:
        local = "x" * 70  # local-part > 64 -> validator reject (patterns.go:349)
    return f"{local}@{rng.choice(_DOM)}.{rng.choice(_TLD)}"


def gen_phone_us(rng, valid=True) -> str:
    area = f"{rng.integers(2, 10)}{_digits(rng, 2)}"
    exch = f"{rng.integers(2, 10)}{_digits(rng, 2)}"
    if not valid:
        exch = "1" + _digits(rng, 2)  # exchange starts with 1 -> reject
        # NB: the regex itself requires [2-9] for both groups, so this
        # near-miss usually fails the REGEX not the validator -- both paths
        # are exercised across the corpus.
    style = rng.integers(0, 3)
    if style == 0:
        return f"({area}) {exch}-{_digits(rng, 4)}"
    if style == 1:
        return f"{area}-{exch}-{_digits(rng, 4)}"
    return f"{area}{exch}{_digits(rng, 4)}"


def gen_ssn(rng, valid=True) -> str:
    if not valid:
        return rng.choice(["000-12-3456", "666-23-4567", "123-00-4567",
                           "123-45-0000", "123-45-6789"])
    area = rng.integers(1, 900)
    while area == 666:
        area = rng.integers(1, 900)
    return f"{area:03d}-{rng.integers(1, 100):02d}-{rng.integers(1, 10000):04d}"


def _luhn_check_digit(digits: str) -> str:
    total = 0
    # compute for digits + check: positions from the right of full number
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 0:  # these will be the "alternate" positions
            d *= 2
            if d > 9:
                d = d % 10 + 1
        total += d
    return str((10 - total % 10) % 10)


def gen_credit_card(rng, valid=True) -> str:
    scheme = rng.integers(0, 3)
    if scheme == 0:
        body = "4" + _digits(rng, 14)
    elif scheme == 1:
        body = "5" + str(rng.integers(1, 6)) + _digits(rng, 13)
    else:
        body = "6011" + _digits(rng, 11)
    number = body + _luhn_check_digit(body)
    if not valid:
        last = (int(number[-1]) + 1 + int(rng.integers(0, 9))) % 10
        number = number[:-1] + str(last)
    return number


def gen_ip(rng, valid=True) -> str:
    return ".".join(str(rng.integers(1, 255)) for _ in range(4))


def gen_url(rng, valid=True) -> str:
    return (f"https://{rng.choice(_DOM)}.{rng.choice(_TLD)}/"
            f"p/{_digits(rng, 4)}?ref={_digits(rng, 3)}")


def gen_bank_account(rng, valid=True) -> str:
    return _digits(rng, int(rng.integers(10, 14)))


def gen_driver_license(rng, valid=True) -> str:
    letters = "".join(chr(65 + d) for d in rng.integers(0, 26, int(rng.integers(1, 3))))
    return letters + _digits(rng, int(rng.integers(6, 9)))


def gen_passport(rng, valid=True) -> str:
    return chr(65 + int(rng.integers(0, 26))) + _digits(rng, 8)


def gen_date(rng, valid=True) -> str:
    if rng.integers(0, 2) == 0:
        return f"{rng.integers(1, 13)}/{rng.integers(1, 29)}/{rng.integers(1990, 2026)}"
    return f"{rng.integers(1990, 2026)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"


def gen_canada_sin(rng, valid=True) -> str:
    return f"{_digits(rng, 3)}-{_digits(rng, 3)}-{_digits(rng, 3)}"


def gen_uk_nino(rng, valid=True) -> str:
    first = rng.choice(list("ABCEGHJKLMNPRSTWYZ"))
    second = rng.choice(list("ABCEGHJKLMNPRSTWYZ"))
    return f"{first}{second}{_digits(rng, 6)}{rng.choice(list('ABCD'))}"


def gen_iban(rng, valid=True) -> str:
    cc = rng.choice(["GB", "DE", "FR", "ES", "NL"])
    return f"{cc}{_digits(rng, 2)}WEST{_digits(rng, 7)}{_digits(rng, 6)}"


def gen_medical_record(rng, valid=True) -> str:
    prefix = rng.choice(["MRN-", "MRN ", "MR-", "MED-", "MED "])
    return prefix + _digits(rng, int(rng.integers(6, 10)))


def gen_vin(rng, valid=True) -> str:
    alphabet = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"
    return "".join(rng.choice(list(alphabet)) for _ in range(17))


def gen_mac(rng, valid=True) -> str:
    sep = rng.choice([":", "-"])
    return sep.join(f"{int(b):02x}" for b in rng.integers(0, 256, 6))


def gen_bitcoin(rng, valid=True) -> str:
    alphabet = "abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789"
    alphabet = alphabet.replace("l", "")
    return rng.choice(["1", "3"]) + "".join(
        rng.choice(list(alphabet)) for _ in range(int(rng.integers(25, 35)))
    )


def gen_phone_intl(rng, valid=True) -> str:
    # Note the \b quirk: '+' must follow a word char to match; templates
    # below attach it as "tel:+.." (no match) or "call+44.." (match).
    return f"+{rng.integers(1, 100)} {_digits(rng, 10)}"


GENERATORS = (
    ("email", gen_email),
    ("phone_us", gen_phone_us),
    ("ssn", gen_ssn),
    ("credit_card", gen_credit_card),
    ("ip_address", gen_ip),
    ("url", gen_url),
    ("bank_account", gen_bank_account),
    ("driver_license", gen_driver_license),
    ("passport", gen_passport),
    ("date", gen_date),
    ("canada_sin", gen_canada_sin),
    ("uk_nino", gen_uk_nino),
    ("iban", gen_iban),
    ("medical_record", gen_medical_record),
    ("vin", gen_vin),
    ("mac_address", gen_mac),
    ("bitcoin_address", gen_bitcoin),
    ("phone_international", gen_phone_intl),
)

# Sentence templates carrying contextual keywords (confidence_scoring.go:270-281).
PII_TEMPLATES = (
    "Contact the customer at {pii} for private account questions.",
    "Our support team filed a sample ticket referencing {pii} yesterday.",
    "The patient record lists {pii} as confidential personal data.",
    "For the demo environment the placeholder value is {pii} only.",
    "An employee reported that {pii} appeared in the private logs.",
    "Marketing kept a test entry with {pii} in the company sheet.",
)

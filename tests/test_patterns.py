"""Per-pattern parity tests: curated positive/negative vectors per
SURVEY.md section 5 item 2 (reference bank patterns.go:38-179 + validators
:226-363)."""

from azure_based_pii_redactor_spark.kernel import detect_pii
from azure_based_pii_redactor_spark.kernel.patterns import (
    PATTERNS,
    is_valid_credit_card,
    is_valid_email,
    is_valid_ssn,
    is_valid_us_phone,
)


def types_in(text):
    return {e.type for e in detect_pii(text)}


def test_pattern_bank_complete():
    assert len(PATTERNS) == 18


# -- email (incl. the [A-Z|a-z] quirk: '|' is a literal class member) ------

def test_email_positive():
    ents = [e for e in detect_pii("contact john.doe+x@sub.example.co now")
            if e.type == "email"]
    assert [e.text for e in ents] == ["john.doe+x@sub.example.co"]


def test_email_quirk_pipe_in_class():
    # The literal | inside [A-Z|a-z]{2,} means '|' may appear INSIDE the
    # TLD run: the whole of "ab|cd" is consumed by the class.
    ents = [e for e in detect_pii("x@y.ab|cd ") if e.type == "email"]
    assert [e.text for e in ents] == ["x@y.ab|cd"]


def test_email_validator():
    assert is_valid_email("a@b.com")
    assert not is_valid_email("a" * 65 + "@b.com")  # local >64 (patterns.go:349)
    assert not is_valid_email("a@bcom")  # no dot in domain


def test_email_long_local_rejected_end_to_end():
    assert "email" not in types_in("mail " + "a" * 65 + "@b.com here")


# -- phones ----------------------------------------------------------------

def test_phone_us_positive():
    for t in ["(212) 555-4567", "212-555-4567", "+1 212 555 4567", "2125554567"]:
        assert "phone_us" in types_in(f"call {t} today"), t


def test_phone_us_validator():
    assert is_valid_us_phone("(212) 555-4567")
    assert not is_valid_us_phone("(012) 555-4567")  # area starts with 0
    assert not is_valid_us_phone("(212) 155-4567")  # exchange starts with 1
    assert not is_valid_us_phone("12345")


def test_phone_international():
    # Reference quirk: the leading \b before \+ only matches when a word
    # char directly precedes '+' (patterns.go:53) -- '+' after a space
    # never fires this pattern, in Go RE2 and Python re alike.
    assert "phone_international" in types_in("ring+44 2079460958 please")
    assert "phone_international" not in types_in("ring +44 please")


# -- ssn ---------------------------------------------------------------------

def test_ssn_positive():
    assert "ssn" in types_in("ssn 536-90-4399 on file")
    assert "ssn" in types_in("ssn 536904399 on file")


def test_ssn_validator():
    assert is_valid_ssn("536-90-4399")
    for bad in ["000-12-3456", "666-12-3456", "123-00-4567", "123-45-0000",
                "123-45-6789", "111-11-1111"]:
        assert not is_valid_ssn(bad), bad


# -- credit card (Luhn) ------------------------------------------------------

def test_credit_card_luhn():
    assert is_valid_credit_card("4111111111111111")  # Visa test number
    assert not is_valid_credit_card("4111111111111112")
    assert is_valid_credit_card("5500005555555559")  # MC test number
    assert is_valid_credit_card("378282246310005")  # Amex test number


def test_credit_card_end_to_end():
    assert "credit_card" in types_in("card 4111111111111111 charged")
    assert "credit_card" not in types_in("card 4111111111111112 charged")


# -- simple patterns ---------------------------------------------------------

def test_ip_address():
    ents = [e for e in detect_pii("from 10.0.0.1 to 999.999.999.999")
            if e.type == "ip_address"]
    # The reference pattern has no octet-range validation: both match.
    assert [e.text for e in ents] == ["10.0.0.1", "999.999.999.999"]


def test_url_greedy():
    ents = [e for e in detect_pii("see https://example.com/a?b=c#d end")
            if e.type == "url"]
    assert ents[0].text == "https://example.com/a?b=c#d"


def test_mac_address():
    assert "mac_address" in types_in("nic 00:1A:2b:3C:4d:5E up")
    assert "mac_address" in types_in("nic 00-1A-2B-3C-4D-5E up")


def test_date_formats():
    assert "date" in types_in("on 12/31/2024 we met")
    assert "date" in types_in("on 2024-12-31 we met")


def test_canada_sin():
    assert "canada_sin" in types_in("sin 046-454-286 given")


def test_uk_nino():
    assert "uk_nino" in types_in("nino AB123456C provided")
    # D and F are not valid first letters for the class
    assert "uk_nino" not in types_in("nino DB123456C provided")


def test_iban():
    assert "iban" in types_in("iban GB82WEST12345698765432 paid")


def test_medical_record():
    assert "medical_record" in types_in("chart MRN-1234567 reviewed")
    assert "medical_record" in types_in("chart MED 654321 reviewed")


def test_vin():
    assert "vin" in types_in("vin 1HGCM82633A004352 sold")
    # I, O, Q excluded from the class
    assert "vin" not in types_in("vin IHGCM82633A00435O sold")


def test_passport_and_driver_license():
    t = types_in("passport C03005988 issued")
    assert "passport" in t
    assert "driver_license" in t  # \b[A-Z]{1,2}\d{6,8}\b overlaps by design


def test_bank_account_digit_run():
    assert "bank_account" in types_in("acct 12345678901 credited")


def test_bitcoin_address():
    assert "bitcoin_address" in types_in(
        "pay 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa now"
    )
    assert "bitcoin_address" in types_in(
        "pay bc1qar0srrr7xfkvy5l643lydnw9re59gtzzwf5mdq now"
    )


# -- detection invariants ----------------------------------------------------

def test_output_canonically_sorted():
    ents = detect_pii("a@b.com then 10.0.0.1 then 536-90-4399")
    keys = [(e.start, e.end, e.type) for e in ents]
    assert keys == sorted(keys)


def test_cross_pattern_overlap_allowed():
    # ssn with no dashes is also a 9-digit driver_license candidate.
    t = types_in("id 536904399 end")
    assert "ssn" in t and "driver_license" in t

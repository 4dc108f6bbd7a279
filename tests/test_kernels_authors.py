"""Parity tests for author kernels. Source: /root/reference/src/utils.rs:560-600."""

from biblib_spark.kernels.authors import parse_author_name, split_given_and_middle


def test_parse_author_name():
    assert parse_author_name("Smith, John") == ("Smith", "John")
    assert parse_author_name("Duan, J.J.") == ("Duan", "J.J.")
    assert parse_author_name("Smith John") == ("Smith", "John")
    assert parse_author_name("Duan JJ") == ("Duan", "JJ")
    assert parse_author_name("Smith") == ("Smith", "")
    assert parse_author_name("Smith-Jones, John-Paul") == ("Smith-Jones", "John-Paul")
    assert parse_author_name("") == ("", "")
    assert parse_author_name("von  Neumann,    John") == ("von  Neumann", "John")


def test_split_given_and_middle():
    assert split_given_and_middle("John") == ("John", None)
    assert split_given_and_middle("John Paul") == ("John", "Paul")
    assert split_given_and_middle("John Paul George") == ("John", "Paul George")
    assert split_given_and_middle("  ") == (None, None)
    assert split_given_and_middle("") == (None, None)

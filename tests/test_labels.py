"""Golden tests for label spaces and Y-vector encoding.

Expected encodings are hand-computed from the task definitions
(reference semantics: clair/task/main.py:51-81, gt21.py:92-108).
"""

import numpy as np

from clair_tpu.task import (
    GT21,
    Genotype,
    VariantLength,
    genotype_code_from,
    genotype_for_task,
    gt21_code_from,
    label_vector_from_reference,
    label_vector_from_truth,
    split_label_vector,
)
from clair_tpu.task.labels import OUTPUT_LABEL_COUNT, label_batch_from_codes


def test_gt21_alphabet_order():
    assert int(GT21.AA) == 0
    assert int(GT21.TT) == 9
    assert int(GT21.DelDel) == 10
    assert int(GT21.InsIns) == 15
    assert int(GT21.InsDel) == 20
    assert len(list(GT21)) == 21


def test_gt21_from_snp_records():
    # hom SNP: ref A, alt G, 1/1 -> GG
    assert gt21_code_from("A", "G", 1, 1) == GT21.GG
    # het SNP: ref A, alt G, 0/1 -> AG (pair with reference allele)
    assert gt21_code_from("A", "G", 0, 1) == GT21.AG
    # multiallelic SNP: C,T on ref A -> CT
    assert gt21_code_from("A", "C,T", 1, 2) == GT21.CT
    # unordered: alt G on ref T het -> GT (sorted)
    assert gt21_code_from("T", "G", 0, 1) == GT21.GT


def test_gt21_from_indel_records():
    # hom insertion: ref A alt AG 1/1 -> InsIns
    assert gt21_code_from("A", "AG", 1, 1) == GT21.InsIns
    # het insertion: ref A alt AG 0/1 -> AIns
    assert gt21_code_from("A", "AG", 0, 1) == GT21.AIns
    # het deletion on ref CT alt C 0/1 -> CIns? no: ref kind is base C, alt is Del -> CDel
    assert gt21_code_from("CT", "C", 0, 1) == GT21.CDel
    # hom deletion 1/1 -> DelDel
    assert gt21_code_from("CT", "C", 1, 1) == GT21.DelDel
    # ins + del multiallelic -> InsDel
    assert gt21_code_from("CT", "C,CTG", 1, 2) == GT21.InsDel


def test_genotype_codes():
    assert genotype_code_from(0, 0) == Genotype.homo_reference
    assert genotype_code_from(1, 1) == Genotype.homo_variant
    assert genotype_code_from(0, 1) == Genotype.hetero_variant
    assert genotype_code_from(1, 2) == Genotype.hetero_variant_multi
    assert genotype_for_task(Genotype.hetero_variant_multi) == Genotype.hetero_variant


def test_reference_label_vector():
    y = label_vector_from_reference("C")
    assert y.shape == (OUTPUT_LABEL_COUNT,)
    gt21, geno, len1, len2 = split_label_vector(y)
    assert np.argmax(gt21) == GT21.CC
    assert np.argmax(geno) == Genotype.homo_reference
    assert np.argmax(len1) == VariantLength.index_offset
    assert np.argmax(len2) == VariantLength.index_offset
    assert y.sum() == 4.0


def test_truth_label_vector_het_snp():
    y = label_vector_from_truth("A", "G", 0, 1)
    gt21, geno, len1, len2 = split_label_vector(y)
    assert np.argmax(gt21) == GT21.AG
    assert np.argmax(geno) == Genotype.hetero_variant
    assert np.argmax(len1) == 16 and np.argmax(len2) == 16


def test_truth_label_vector_insertion_lengths_sorted_and_clamped():
    # het 20-bp insertion: lengths are (0, +20 clamped to +16), sorted ascending
    y = label_vector_from_truth("A", "A" + "G" * 20, 0, 1)
    _, _, len1, len2 = split_label_vector(y)
    assert np.argmax(len1) == 0 + VariantLength.index_offset
    assert np.argmax(len2) == 16 + VariantLength.index_offset

    # 1/2 del+ins: lengths sorted so deletion first
    y = label_vector_from_truth("CT", "C,CTG", 1, 2)
    gt21, geno, len1, len2 = split_label_vector(y)
    assert np.argmax(gt21) == GT21.InsDel
    assert np.argmax(geno) == Genotype.hetero_variant  # folded for task
    assert np.argmax(len1) == -1 + VariantLength.index_offset
    assert np.argmax(len2) == 1 + VariantLength.index_offset


def test_batch_one_hot_matches_scalar_encoder():
    y_scalar = label_vector_from_truth("A", "G", 0, 1)
    y_batch = label_batch_from_codes(
        np.array([GT21.AG]), np.array([Genotype.hetero_variant]),
        np.array([16]), np.array([16]),
    )
    np.testing.assert_array_equal(y_batch[0], y_scalar)

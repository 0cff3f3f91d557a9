// Native traceback → byte-CIGAR decoder for genomics_tpu.
//
// Replicates the gasal_get_tb state machine (reference:
// CDP/GASAL2/src/kernels/get_tb.h:5-149) over the framework's packed
// nibble matrices: [Lt/8, Lq] int32 per alignment, cell (i, j) in bits
// 4*(i%8)..4*(i%8)+3 of packed[(i/8)*Lq + j] (8 TARGET rows per word —
// the layout the Pallas kernels emit without per-step reshapes).
// Nibble: bit3 = f_ext, bit2 = e_ext, bits1:0 = dir (0=M 1=X 2=D 3=I).
//
// The walk is inherently serial per alignment (data-dependent), which
// is why it lives on the host in C++ (OpenMP across alignments) instead
// of on the TPU — the same split GASAL2 uses (device writes direction
// matrices, a separate pass walks them).
//
// Byte-CIGAR format (reference README.md:214-224): op | count << 2,
// emitted in walk (reverse-alignment) order, count <= 63.

#include <cstdint>
#include <cstring>

extern "C" {

// Decode one alignment's traceback.  Returns number of ops written.
// algo: 0 = local (score-stop; writes q/t starts), 1 = global (D/I pad),
//       2 = semiglobal EXTENSION (the reference writes WITH_TB direction
//       matrices for semiglobal but never launches gasal_get_tb on them,
//       gasal_align.h:7-33 — semantics defined by golds.decode_tb):
//       walk from the caller-resolved end cell; pad leading D only when
//       the target HEAD is not skipped (flags bit1), leading I only when
//       the query HEAD is not skipped (flags bit0); starts = first
//       consumed position of head-skipped dimensions.
static int decode_one(const int32_t* packed, int64_t str_s, int64_t str_q,
                      int Lt8, int Lq,
                      int qlen, int tlen, int algo, int flags,
                      int score, int qend, int tend,
                      int match, int mismatch, int gap_oe, int gap_extend,
                      uint8_t* out, int max_ops,
                      int32_t* qstart, int32_t* tstart) {
    int i, j;
    int total_score = 0, curr_score = 0;
    if (algo == 0 || algo == 2) {
        i = tend;
        j = qend;
        total_score = score;
    } else {
        i = tlen;
        j = qlen;
    }
    int head_q = flags & 1, head_t = flags & 2;
    int Lt = Lt8 * 8;
    uint32_t prev_op = 0;
    int count = 0;
    int op_select = 3, op_shift = 0;
    int n = 0;

    while (i >= 0 && j >= 0) {
        uint32_t cell_op = 0;
        if (i < Lt && j < Lq) {
            uint32_t word =
                (uint32_t)packed[(int64_t)(i >> 3) * str_s + (int64_t)j * str_q];
            cell_op = (word >> (4 * (i & 7))) & 0xF;
        }
        uint32_t op = (cell_op >> op_shift) & (uint32_t)op_select;
        uint32_t op_to_fill = (op == 0 || op_select == 3) ? op : (uint32_t)op_shift;
        int new_select = (op == 0 || (op == 1 && op_select == 3)) ? 3 : 1;
        if (op == 0 || (op == 1 && op_select == 3)) {
            op_shift = 0;
        } else if ((op == 2 || op == 3) && op_select == 3) {
            op_shift = (int)op;
        }
        op_select = new_select;

        if (count < 63 && op_to_fill == prev_op) {
            count++;
        } else {
            if (count > 0) {
                if (n < max_ops) out[n] = (uint8_t)(prev_op | (count << 2));
                n++;
            }
            count = 1;
        }
        if (algo == 0) {
            if ((op_to_fill == 2 || op_to_fill == 3) && prev_op != op_to_fill)
                curr_score -= gap_oe;
            else if (op_to_fill == 2 || op_to_fill == 3)
                curr_score -= gap_extend;
            else if (op_to_fill == 1)
                curr_score -= mismatch;
            else
                curr_score += match;
            if (curr_score == total_score) {
                prev_op = op_to_fill;
                break;
            }
        }
        prev_op = op_to_fill;
        if (op_to_fill == 0 || op_to_fill == 1 || op_to_fill == 2) i--;
        if (op_to_fill == 0 || op_to_fill == 1 || op_to_fill == 3) j--;
    }
    if (n < max_ops) out[n] = (uint8_t)(prev_op | (count << 2));
    n++;
    if (algo == 1 || (algo == 2 && !head_t)) {
        while (i >= 0) {
            int c = (i + 1) <= 63 ? (i + 1) : 63;
            if (n < max_ops) out[n] = (uint8_t)(2 | (c << 2));
            n++;
            i -= 63;
        }
    }
    if (algo == 1 || (algo == 2 && !head_q)) {
        while (j >= 0) {
            int c = (j + 1) <= 63 ? (j + 1) : 63;
            if (n < max_ops) out[n] = (uint8_t)(3 | (c << 2));
            n++;
            j -= 63;
        }
    }
    if (algo == 0) {
        *qstart = j;
        *tstart = i;
    } else if (algo == 2) {
        *qstart = (j + 1) > 0 ? (j + 1) : 0;
        *tstart = (i + 1) > 0 ? (i + 1) : 0;
    } else {
        *qstart = 0;
        *tstart = 0;
    }
    return n;
}

// Batched decode with arbitrary element strides — lets the Pallas TB
// kernel's natural [strip, q, batch] HBM layout feed the walk directly,
// skipping the 2x-matrix-size device transpose the [B, strip, q] layout
// cost.  strides are in int32 elements.
void gt_decode_tb_batch_strided(
    const int32_t* packed, int64_t str_b, int64_t str_s, int64_t str_q,
    int B, int Lt8, int Lq,
    const int32_t* qlen, const int32_t* tlen,
    const int32_t* score, const int32_t* qend,
    const int32_t* tend, int algo, int flags,
    int match, int mismatch, int gap_oe, int gap_extend,
    uint8_t* cigars, int max_ops, int32_t* n_ops,
    int32_t* qstart, int32_t* tstart) {
#pragma omp parallel for schedule(dynamic, 16)
    for (int b = 0; b < B; b++) {
        n_ops[b] = decode_one(
            packed + (int64_t)b * str_b, str_s, str_q, Lt8, Lq,
            qlen[b], tlen[b], algo,
            flags, score[b], qend[b], tend[b], match, mismatch, gap_oe,
            gap_extend, cigars + (size_t)b * max_ops, max_ops, &qstart[b],
            &tstart[b]);
    }
}

// Batched decode.  packed: [B, Lt8, Lq] int32 contiguous.
void gt_decode_tb_batch(const int32_t* packed, int B, int Lt8, int Lq,
                        const int32_t* qlen, const int32_t* tlen,
                        const int32_t* score, const int32_t* qend,
                        const int32_t* tend, int algo, int flags,
                        int match, int mismatch, int gap_oe, int gap_extend,
                        uint8_t* cigars, int max_ops, int32_t* n_ops,
                        int32_t* qstart, int32_t* tstart) {
    gt_decode_tb_batch_strided(
        packed, (int64_t)Lt8 * Lq, Lq, 1, B, Lt8, Lq, qlen, tlen, score,
        qend, tend, algo, flags, match, mismatch, gap_oe, gap_extend,
        cigars, max_ops, n_ops, qstart, tstart);
}

// 4-bit encode: ASCII → code (c & 0xF), vectorized helper for host prep.
void gt_encode4(const uint8_t* ascii, int64_t n, uint8_t* out) {
    for (int64_t k = 0; k < n; k++) out[k] = ascii[k] & 0xF;
}

}  // extern "C"

/* avdec — minimal libavcodec H.264 Annex-B decoder harness.
 *
 * Decodes an .264 elementary stream to raw I420 frames on stdout-file and
 * prints libav diagnostics; used by the conformance tests as the
 * independent decoder oracle (alongside tools/refdec.py), replacing the
 * JM decoder of the reference's doc/regression_test.txt flow.
 *
 * Build: gcc -O2 tools/avdec.c -o tools/avdec -lavcodec -lavutil
 * Usage: avdec in.264 out.yuv [loglevel]
 */
#include <libavcodec/avcodec.h>
#include <libavutil/log.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static FILE *out;
static int nframes = 0;

#include <libavutil/motion_vector.h>

static void write_frame(AVFrame *f) {
    for (int p = 0; p < 3; p++) {
        int w = p ? f->width / 2 : f->width;
        int h = p ? f->height / 2 : f->height;
        for (int y = 0; y < h; y++)
            fwrite(f->data[p] + y * f->linesize[p], 1, w, out);
    }
    if (getenv("AVDEC_DUMP_MVS")) {
        AVFrameSideData *sd =
            av_frame_get_side_data(f, AV_FRAME_DATA_MOTION_VECTORS);
        if (sd) {
            const AVMotionVector *mv = (const AVMotionVector *)sd->data;
            int n = sd->size / sizeof(*mv);
            for (int i = 0; i < n; i++)
                fprintf(stderr,
                        "MV frame=%d src=%d blk=%dx%d at=%d,%d "
                        "mv=%d,%d\n", nframes, mv[i].source, mv[i].w,
                        mv[i].h, mv[i].dst_x, mv[i].dst_y,
                        mv[i].motion_x, mv[i].motion_y);
        } else {
            fprintf(stderr, "MV frame=%d none\n", nframes);
        }
    }
    nframes++;
}

static int decode(AVCodecContext *c, AVFrame *frame, AVPacket *pkt) {
    int ret = avcodec_send_packet(c, pkt);
    if (ret < 0) { fprintf(stderr, "send_packet err %d\n", ret); return ret; }
    while (ret >= 0) {
        ret = avcodec_receive_frame(c, frame);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
        if (ret < 0) { fprintf(stderr, "recv err %d\n", ret); return ret; }
        write_frame(frame);
    }
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: avdec in.264 out.yuv [lvl]\n");
        return 2; }
    av_log_set_level(argc > 3 ? atoi(argv[3]) : AV_LOG_VERBOSE);
    FILE *in = fopen(argv[1], "rb");
    out = fopen(argv[2], "wb");
    if (!in || !out) { perror("open"); return 2; }

    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *c = avcodec_alloc_context3(codec);
    /* strict conformance: report every spec violation */
    c->err_recognition = AV_EF_EXPLODE | AV_EF_BITSTREAM | AV_EF_COMPLIANT;
    if (getenv("AVDEC_DUMP_MVS"))
        c->flags2 |= AV_CODEC_FLAG2_EXPORT_MVS;
    avcodec_open2(c, codec, NULL);
    AVFrame *frame = av_frame_alloc();
    AVPacket *pkt = av_packet_alloc();

    uint8_t buf[65536];
    size_t n;
    int err = 0;
    while ((n = fread(buf, 1, sizeof buf, in)) > 0) {
        uint8_t *data = buf;
        size_t left = n;
        while (left > 0) {
            int used = av_parser_parse2(parser, c, &pkt->data, &pkt->size,
                                        data, left, AV_NOPTS_VALUE,
                                        AV_NOPTS_VALUE, 0);
            if (used < 0) { err = 1; goto done; }
            data += used; left -= used;
            if (pkt->size && decode(c, frame, pkt) < 0) { err = 1;
                goto done; }
        }
    }
    /* flush parser + decoder */
    {
        int used = av_parser_parse2(parser, c, &pkt->data, &pkt->size,
                                    NULL, 0, AV_NOPTS_VALUE, AV_NOPTS_VALUE,
                                    0);
        (void)used;
        if (pkt->size && decode(c, frame, pkt) < 0) err = 1;
    }
    if (decode(c, frame, NULL) < 0) err = 1;
done:
    fprintf(stderr, "decoded %d frames, err=%d\n", nframes, err);
    fclose(out);
    return err;
}

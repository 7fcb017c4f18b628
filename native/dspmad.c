/* dspmad: minimal C ABI over libmad for the dsp_tpu "mp3" codec.
 *
 * TPU-rebuild counterpart of /root/reference/mp3.c (libmad decode codec).
 * The reference embeds the MAD decoder state directly in its codec vtable;
 * here the same decode strategy sits behind a handle-based shim that
 * dsp_tpu/codecs/mp3.py binds with ctypes:
 *
 *   - 4 KiB bitstream buffer, refilled preserving the undecoded remainder
 *     (mp3.c:32,43-56)
 *   - recoverable MAD errors skipped, MAD_ERROR_BUFLEN triggers a refill,
 *     anything else aborts the stream (mp3.c:65-75)
 *   - total frame count by a full header-only pre-scan with
 *     mad_timer_count(duration, samplerate) accumulation (mp3.c:149-186)
 *   - seek = restart from byte 0 and header-skip to the target, landing on
 *     a frame boundary at or past it (mp3.c:86-134)
 *   - samples scaled to double with mad_f_todouble (prec 24, enc "mad_f")
 *
 * One deviation: dspmad_read returns the frames decoded so far when the
 * file ends mid-request instead of dropping them (mp3.c:70 returns 0,
 * losing the partial tail); the Python codec layer expects short reads at
 * EOF.
 *
 * Build (only where mad.h exists): make -C native mad
 */

#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <fcntl.h>
#include <mad.h>

#define DSPMAD_BUF_SIZE (1 << 12)

struct dspmad {
	int fd;
	struct mad_stream stream;
	struct mad_frame frame;
	struct mad_synth synth;
	long pcm_pos;      /* consumed samples of the current synth block */
	long frames;       /* total PCM frames (pre-scan) */
	int fs;
	int channels;
	unsigned char buf[DSPMAD_BUF_SIZE];
};

static void dspmad_units_begin(struct dspmad *h)
{
	mad_stream_init(&h->stream);
	mad_frame_init(&h->frame);
	mad_synth_init(&h->synth);
	h->pcm_pos = 0;
}

static void dspmad_units_end(struct dspmad *h)
{
	mad_stream_finish(&h->stream);
	mad_frame_finish(&h->frame);
	mad_synth_finish(&h->synth);
}

/* Slide the undecoded remainder down and read more bytes after it.
 * Returns the number of new bytes, 0 at EOF/error. */
static long dspmad_fill(struct dspmad *h)
{
	long rem = 0;
	if (h->stream.next_frame != NULL)
		rem = h->stream.bufend - h->stream.next_frame;
	if (rem > 0)
		memmove(h->buf, h->stream.next_frame, rem);
	long r = read(h->fd, h->buf + rem, DSPMAD_BUF_SIZE - rem);
	if (r <= 0)
		return 0;
	mad_stream_buffer(&h->stream, h->buf, r + rem);
	h->stream.error = 0;
	return r;
}

/* Decode the next full frame into h->synth; 0 ok, -1 end/error. */
static int dspmad_next_frame(struct dspmad *h)
{
	while (mad_frame_decode(&h->frame, &h->stream)) {
		if (MAD_RECOVERABLE(h->stream.error))
			continue;
		if (h->stream.error == MAD_ERROR_BUFLEN) {
			if (dspmad_fill(h) == 0)
				return -1;
			continue;
		}
		return -1;
	}
	mad_synth_frame(&h->synth, &h->frame);
	h->pcm_pos = 0;
	return 0;
}

/* Header-only scan of the whole file for the total frame count. */
static long dspmad_scan_len(struct dspmad *h)
{
	long len = 0;
	dspmad_units_begin(h);
	if (dspmad_fill(h) == 0) {
		dspmad_units_end(h);
		return -1;
	}
	for (;;) {
		while (mad_header_decode(&h->frame.header, &h->stream)) {
			if (MAD_RECOVERABLE(h->stream.error))
				continue;
			if (h->stream.error == MAD_ERROR_BUFLEN) {
				if (dspmad_fill(h) == 0)
					goto done;
				continue;
			}
			goto done;
		}
		len += mad_timer_count(h->frame.header.duration,
		                       h->frame.header.samplerate);
	}
done:
	dspmad_units_end(h);
	lseek(h->fd, 0, SEEK_SET);
	return len;
}

void * dspmad_open(const char *path)
{
	struct dspmad *h = calloc(1, sizeof(*h));
	if (!h)
		return NULL;
	if ((h->fd = open(path, O_RDONLY)) == -1) {
		free(h);
		return NULL;
	}
	if ((h->frames = dspmad_scan_len(h)) < 0)
		goto fail;
	dspmad_units_begin(h);
	if (dspmad_fill(h) == 0 || dspmad_next_frame(h) != 0) {
		dspmad_units_end(h);
		goto fail;
	}
	h->fs = h->frame.header.samplerate;
	h->channels = MAD_NCHANNELS(&h->frame.header);
	return h;
fail:
	close(h->fd);
	free(h);
	return NULL;
}

int dspmad_sample_rate(void *p) { return ((struct dspmad *) p)->fs; }
int dspmad_channels(void *p)    { return ((struct dspmad *) p)->channels; }
long dspmad_frames(void *p)     { return ((struct dspmad *) p)->frames; }

/* Interleaved doubles; returns frames written (short at EOF). */
long dspmad_read(void *p, double *buf, long frames)
{
	struct dspmad *h = (struct dspmad *) p;
	long done = 0;
	while (done < frames) {
		if (h->pcm_pos >= h->synth.pcm.length) {
			if (dspmad_next_frame(h) != 0)
				break;
		}
		long avail = h->synth.pcm.length - h->pcm_pos;
		long want = frames - done;
		long n = avail < want ? avail : want;
		const mad_fixed_t *l = h->synth.pcm.samples[0] + h->pcm_pos;
		const mad_fixed_t *r = h->synth.pcm.samples[1] + h->pcm_pos;
		double *out = buf + done * h->channels;
		for (long i = 0; i < n; ++i) {
			*out++ = mad_f_todouble(l[i]);
			if (h->channels == 2)
				*out++ = mad_f_todouble(r[i]);
		}
		h->pcm_pos += n;
		done += n;
	}
	return done;
}

/* Restart + header-skip; returns the landing position (frame boundary at or
 * past pos) or -1. */
long dspmad_seek(void *p, long pos)
{
	struct dspmad *h = (struct dspmad *) p;
	if (pos < 0)
		pos = 0;
	else if (pos >= h->frames)
		pos = h->frames > 0 ? h->frames - 1 : 0;
	if (lseek(h->fd, 0, SEEK_SET) < 0)
		return -1;
	dspmad_units_end(h);
	dspmad_units_begin(h);
	if (dspmad_fill(h) == 0)
		return -1;
	long fpos = 0;
	while (fpos < pos) {
		while (mad_header_decode(&h->frame.header, &h->stream)) {
			if (MAD_RECOVERABLE(h->stream.error))
				continue;
			if (h->stream.error == MAD_ERROR_BUFLEN) {
				if (dspmad_fill(h) == 0)
					return fpos;
				continue;
			}
			return fpos;
		}
		fpos += mad_timer_count(h->frame.header.duration,
		                        h->frame.header.samplerate);
	}
	dspmad_next_frame(h);  /* position is fpos either way */
	return fpos;
}

void dspmad_close(void *p)
{
	struct dspmad *h = (struct dspmad *) p;
	if (!h)
		return;
	if (h->fd != -1)
		close(h->fd);
	dspmad_units_end(h);
	free(h);
}

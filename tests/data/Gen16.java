import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.*;

public class Gen16 {
  static long state = 777;
  static int next(int mod) {
    state = state * 6364136223846793005L + 1442695040888963407L;
    return (int) Math.floorMod(state >>> 33, mod);
  }
  public static void main(String[] args) throws Exception {
    int w = 23, h = 17;
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY);
    WritableRaster r = img.getRaster();
    StringBuilder sb = new StringBuilder();
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int v = next(65536);
        r.setSample(x, y, 0, v);
        sb.append(v); sb.append(x==w-1?"\n":",");
      }
    ImageIO.write(img, "png", new File("jdk_gray16.png"));
    try (PrintWriter pw = new PrintWriter("jdk_gray16_src.txt")) { pw.print(sb); }
    System.out.println("done");
  }
}
